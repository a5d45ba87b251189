"""Block-NeRF Mission Bay eval: masked/unmasked PSNR/SSIM over val
tfrecords. Parity target: switch_nerf/eval_image_blocknerf.py."""
from switch_nerf_tpu.config import get_opts, parse_args
from switch_nerf_tpu.runner import Runner
from switch_nerf_tpu.utils.crash import cli_entry


@cli_entry
def main(hparams=None) -> None:
    if hparams is None:
        hparams = parse_args(get_opts())
    assert hparams.data_type == "block_nerf"
    Runner(hparams).eval_image_blocknerf()


if __name__ == "__main__":
    main()
