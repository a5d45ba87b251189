"""Classic-NeRF eval (per-image PSNR/SSIM over the val split).
Parity target: switch_nerf/eval_nerf_moe.py."""
from switch_nerf_tpu.config import get_opts_nerf, parse_args
from switch_nerf_tpu.runner import Runner
from switch_nerf_tpu.utils.crash import cli_entry


@cli_entry
def main(hparams=None) -> None:
    if hparams is None:
        hparams = parse_args(get_opts_nerf())
    assert hparams.data_type == "nerf"
    Runner(hparams).eval_nerf()


if __name__ == "__main__":
    main()
