"""switch_nerf_tpu — a TPU-native (JAX/XLA/Pallas) reimplementation of the
Switch-NeRF framework (reference: MiZhenxing/Switch-NeRF).

The framework trains and evaluates large-scale Neural Radiance Fields whose
scene MLP is a top-1 switch-gated Mixture-of-Experts, with:

  * capacity-factor token dispatch + batch-prioritized routing
    (reference: switch_nerf/modules/tutel_moe_ext/tutel_fast_dispatch.py)
  * an external gate network and gate-input LayerNorm
    (reference: switch_nerf/models/nerf_moe.py:346-374)
  * load-balance auxiliary loss (tutel_fast_dispatch_nobatch.py:170-179)
  * classic + mip-NeRF volume rendering (rendering.py / rendering_mip.py)
  * Mega-NeRF / Block-NeRF / classic-NeRF data pipelines
  * data parallelism and expert parallelism over a jax.sharding.Mesh
    (replacing DDP/NCCL; reference: runner.py:205-218, tutel all_to_all)

Design stance: a small functional core — `state = create_train_state(cfg)`,
`state, metrics = train_step(state, batch)` under jit/shard_map — with the MoE
as a library module. Token dispatch is the gather formulation (scatter int32
slot indices, gather token rows), expert MLPs are stacked batched einsums on
the MXU, and Python chunk loops become lax.scan with rematerialisation.
"""

__version__ = "0.1.0"
