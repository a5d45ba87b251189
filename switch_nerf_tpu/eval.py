"""Validation-protocol eval (same metrics as training-time validation).
Parity target: switch_nerf/eval.py."""
from switch_nerf_tpu.config import get_opts, parse_args
from switch_nerf_tpu.runner import Runner


def main(hparams=None) -> None:
    if hparams is None:
        hparams = parse_args(get_opts())
    Runner(hparams).eval_image()


if __name__ == "__main__":
    main()
