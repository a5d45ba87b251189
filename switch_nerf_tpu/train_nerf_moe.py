"""Training entry point for classic-NeRF datasets (llff/blender/bungee).

Parity target: switch_nerf/train_nerf_moe.py:10-29 (asserts data_type ==
"nerf", epoch-based loop, no AMP scaler).
"""
from switch_nerf_tpu.config import get_opts_nerf, parse_args
from switch_nerf_tpu.runner import Runner
from switch_nerf_tpu.utils.crash import cli_entry


@cli_entry
def main(hparams=None) -> None:
    if hparams is None:
        hparams = parse_args(get_opts_nerf())
    assert hparams.data_type == "nerf", \
        "train_nerf_moe requires data_type=nerf"
    if hparams.detect_anomalies:
        import jax
        jax.config.update("jax_debug_nans", True)
    Runner(hparams).train_nerf()


if __name__ == "__main__":
    main()
