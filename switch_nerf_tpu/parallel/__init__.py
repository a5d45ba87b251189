"""Device-mesh parallelism: the TPU-native replacement for the reference's
DDP/NCCL + Tutel process-group zoo (SURVEY.md §2.7).

  * DP — global ray batch sharded over the flattened ('data','expert') mesh;
    gradient all-reduce is inserted by the XLA SPMD partitioner (replacing
    torch DDP, runner.py:205-218).
  * EP — expert parameters and the [E, C, M] dispatch buffer sharded over the
    'expert' axis; XLA materialises the token exchange as an all-to-all over
    ICI (replacing Tutel's NCCL all_to_all_single,
    tutel_moe_layer_nobatch.py:172,185).
  * finite-check — `jnp.isfinite` folded with a global AND (replacing the
    all_gather vote at runner.py:620-673); under SPMD every shard computes
    the same verdict, so the skip decision is in lockstep by construction.
"""
from switch_nerf_tpu.parallel.mesh import (
    create_mesh,
    batch_spec,
    batch_sharding,
    param_shardings,
    expert_leaf_spec,
    shard_constraint,
    all_finite,
    global_mesh_device_count,
)
