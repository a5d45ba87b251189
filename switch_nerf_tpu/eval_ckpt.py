"""Checkpoint inspection/sanity eval. Parity target: switch_nerf/eval_ckpt.py."""
from switch_nerf_tpu.config import get_opts, parse_args
from switch_nerf_tpu.runner import Runner
from switch_nerf_tpu.utils.crash import cli_entry


@cli_entry
def main(hparams=None) -> None:
    if hparams is None:
        hparams = parse_args(get_opts())
    Runner(hparams, set_experiment_path=False).eval_ckpt()


if __name__ == "__main__":
    main()
