"""Validation-protocol eval (same metrics as training-time validation).
Parity target: switch_nerf/eval.py -> Runner.eval -> _run_validation."""
from switch_nerf_tpu.config import get_opts, parse_args
from switch_nerf_tpu.runner import Runner
from switch_nerf_tpu.utils.crash import cli_entry


@cli_entry
def main(hparams=None) -> None:
    if hparams is None:
        hparams = parse_args(get_opts())
    Runner(hparams).eval()


if __name__ == "__main__":
    main()
