"""Mesh construction and sharding-spec helpers.

Replaces the reference's process-group bootstrap
(tutel_communicate_nobatch.py:160-263, tutel_system.py:27-49): there is no
rank/world/NCCL plumbing — a single `jax.sharding.Mesh` with axes
('data', 'expert') owns every collective, and XLA compiles them onto ICI.

Conventions:
  * the global ray batch is sharded over BOTH axes flattened —
    P(('data','expert')) — matching the reference where DDP spans all ranks
    and (when EP is on) experts are also spread over all ranks
    (runner.py:97-101);
  * expert parameters are [E, ...]-leading; under EP they are sharded over
    'expert' on dim 0 and replicated over 'data';
  * everything else is replicated.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
EXPERT_AXIS = "expert"

# Parameter-path fragments that mark stacked expert weights ([E, ...] leading
# dim). ExpertMLP stores fcs as [E, in, out] / biases [E, 1, out]
# (models/experts.py; reference analog tutel_moe_layer_nobatch.py:837-887).
_EXPERT_PATH_RE = re.compile(r"(^|/)experts(/|$)")


def global_mesh_device_count() -> int:
    """Total devices across ALL processes (mesh sizing)."""
    return jax.device_count()


def create_mesh(mesh_shape: Optional[Sequence[int]] = None,
                devices=None) -> Mesh:
    """Build the ('data','expert') mesh.

    mesh_shape: (n_data, n_expert); default all devices on the data axis
    (matching the reference's EP-off default, opts.py:125-126). For
    multi-host pods pass the global device list — callers should put the
    'expert' axis on the ICI-contiguous innermost dimension so the dispatch
    all-to-all rides ICI, not DCN.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1)
    d, e = mesh_shape
    if d * e != n:
        raise ValueError(f"mesh_shape {mesh_shape} != device count {n}")
    arr = np.asarray(devices).reshape(d, e)
    return Mesh(arr, (DATA_AXIS, EXPERT_AXIS))


def batch_spec() -> P:
    """Rays/rgbs/indices: leading dim sharded over the whole mesh."""
    return P((DATA_AXIS, EXPERT_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def expert_leaf_spec(path: str, leaf, num_experts: int,
                     expert_parallel: bool,
                     weight_parallel: bool = False,
                     data_axis_size: Optional[int] = None) -> P:
    """PartitionSpec for one parameter leaf (path is '/'-joined).

    weight_parallel is the TPU-native analog of the reference's
    ZeRO-style expert-weight slicing (`zero_gather`/`PrimAllgather`,
    tutel_moe_layer_nobatch.py:484-498,595-604,893-903: when experts are
    fewer than devices, each rank keeps 1/r of the hidden dim and
    allgathers before use): expert weight matrices additionally shard
    their LAST (hidden/output) dim over the 'data' axis, and the XLA SPMD
    partitioner places the weight allgather / partial-output collectives
    — no manual gather primitives.
    """
    if (_EXPERT_PATH_RE.search(path)
            and hasattr(leaf, "ndim") and leaf.ndim >= 1
            and leaf.shape[0] == num_experts):
        first = EXPERT_AXIS if expert_parallel else None
        if weight_parallel and leaf.ndim >= 2 and (
                data_axis_size is None
                or leaf.shape[-1] % data_axis_size == 0):
            # device_put needs exact divisibility (no padding outside jit);
            # odd-sized hidden dims stay replicated — same graceful degrade
            # as the ZeRO-1 opt-state sharding below
            return P(first, *([None] * (leaf.ndim - 2)), DATA_AXIS)
        if expert_parallel:
            return P(EXPERT_AXIS)
    return P()


def _key_path_str(kp) -> str:
    """'/'-joined pytree key path (dict keys, sequence indices, and
    namedtuple/dataclass attr names all handled — shared by the param and
    opt-state sharding builders so their path grammar cannot drift)."""
    out = []
    for k in kp:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        elif hasattr(k, "name"):
            out.append(str(k.name))
        else:
            out.append(str(k))
    return "/".join(out)


def param_shardings(params, mesh: Mesh, num_experts: int,
                    expert_parallel: bool, weight_parallel: bool = False):
    """NamedSharding tree for a parameter pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    path_str = _key_path_str

    specs = {path_str(kp): expert_leaf_spec(
        path_str(kp), v, num_experts, expert_parallel, weight_parallel,
        data_axis_size=mesh.shape[DATA_AXIS]) for kp, v in flat}

    def to_sharding(kp, v):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def opt_state_shardings(opt_state, mesh: Mesh, num_experts: int,
                        expert_parallel: bool,
                        weight_parallel: bool = False,
                        zero_data_axis: bool = False):
    """NamedSharding tree for an optimizer-state pytree.

    Adam moments mirror the parameter tree inside their state, so the same
    path-regex + shape rules shard expert moments over the 'expert' axis
    (and the hidden dim over 'data' under weight_parallel). With
    zero_data_axis=True, every remaining float tensor additionally shards
    its dim 0 over 'data' — ZeRO-1 semantics realised by GSPMD (per-shard
    moment update, XLA inserts the update allgather); the reference never
    enables its ZeRO path (zero_gather unused by all published configs),
    so this is an opt-in TPU extension, numerics-invariant because the
    Adam update is elementwise.
    """
    flat = jax.tree_util.tree_flatten_with_path(opt_state)[0]
    path_str = _key_path_str

    def leaf_spec(path, leaf):
        spec = expert_leaf_spec(path, leaf, num_experts, expert_parallel,
                                weight_parallel,
                                data_axis_size=mesh.shape[DATA_AXIS])
        if (zero_data_axis and spec == P()
                and hasattr(leaf, "ndim") and leaf.ndim >= 2
                and hasattr(leaf, "dtype")
                and jnp.issubdtype(leaf.dtype, jnp.floating)
                # device_put needs exact divisibility (unlike in-jit
                # constraints, there is no padding); skip odd-sized leaves
                and leaf.shape[0] % mesh.shape[DATA_AXIS] == 0):
            return P(DATA_AXIS)
        return spec

    specs = {path_str(kp): leaf_spec(path_str(kp), v) for kp, v in flat}

    def to_sharding(kp, v):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(to_sharding, opt_state)


def shard_constraint(x, spec: P):
    """with_sharding_constraint that degrades to identity when no mesh is
    active (unit tests / single-chip paths).

    Only the specific no-context-mesh RuntimeError degrades; genuine
    sharding errors (rank/axis mismatches, divisibility) propagate — a
    silent no-constraint would be exactly the failure mode GSPMD EP
    depends on catching.
    """
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except RuntimeError as e:
        if "non-empty mesh" in str(e):
            return x
        raise


def all_finite(tree) -> jnp.ndarray:
    """Scalar bool: every element of every leaf is finite.

    SPMD analog of the reference's cross-rank finite vote
    (runner.py:620-673): computed on globally-sharded values, so all shards
    agree without an explicit all_gather.
    """
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)]
    if not leaves:
        return jnp.asarray(True)
    flags = [jnp.all(jnp.isfinite(l)) for l in leaves]
    return jnp.stack(flags).all()
