"""Classic-NeRF eval (per-image PSNR/SSIM over the val split).
Parity target: switch_nerf/eval_nerf_moe.py."""
from switch_nerf_tpu.config import get_opts_nerf, parse_args
from switch_nerf_tpu.runner import Runner
from switch_nerf_tpu.parallel.host import init_multi_host
from switch_nerf_tpu.utils.crash import record


@record
def main(hparams=None) -> None:
    # multi-host bootstrap BEFORE any jax backend touch: inert on
    # single-host launches; TPU-pod/SLURM env auto-detected (jax
    # reads SLURM_* natively — replaces the reference's scontrol
    # parsing, tutel_communicate_nobatch.py:56-156; --use_slurm
    # needs no special handling here)
    init_multi_host()
    if hparams is None:
        hparams = parse_args(get_opts_nerf())
    assert hparams.data_type == "nerf"
    Runner(hparams).eval_nerf()


if __name__ == "__main__":
    main()
