"""Training entry point for Mega-NeRF / Block-NeRF scenes.

Parity target: switch_nerf/train.py:10-28. Usage:
    python -m switch_nerf_tpu.train --config_file=configs/switch_nerf/building.yaml \
        --use_moe --exp_name=out --dataset_path=... --chunk_paths=... \
        --use_moe_external_gate --use_gate_input_norm \
        --moe_expert_type=expertmlp --batch_prioritized_routing \
        --moe_capacity_factor=1.0 --batch_size=8192 --moe_l_aux_wt=0.0005

No torch.distributed.launch: one process per host; chips come from the
jax.sharding mesh (--mesh_shape to override).
"""
from switch_nerf_tpu.config import get_opts, parse_args
from switch_nerf_tpu.runner import Runner
from switch_nerf_tpu.utils.crash import cli_entry


@cli_entry
def main(hparams=None) -> None:
    if hparams is None:
        hparams = parse_args(get_opts())
    assert hparams.data_type in ("mega_nerf", "block_nerf"), \
        "use switch_nerf_tpu.train_nerf_moe for data_type=nerf"
    if hparams.detect_anomalies:
        import jax
        jax.config.update("jax_debug_nans", True)
    Runner(hparams).train()


if __name__ == "__main__":
    main()
