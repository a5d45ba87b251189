"""Mega-NeRF test protocol: render val images, PSNR/SSIM/LPIPS on the right
half. Parity target: switch_nerf/eval_image.py:19-26."""
from switch_nerf_tpu.config import get_opts, parse_args
from switch_nerf_tpu.runner import Runner
from switch_nerf_tpu.utils.crash import cli_entry


@cli_entry
def main(hparams=None) -> None:
    if hparams is None:
        hparams = parse_args(get_opts())
    Runner(hparams).eval_image()


if __name__ == "__main__":
    main()
