"""Capacity-padded MoE token dispatch/combine — TPU-native gather formulation.

This replaces the reference's JIT-compiled CUDA scatter/gather kernels
(switch_nerf/modules/tutel_moe_ext/tutel_sparse_nobatch.py:17-135 and the
Tutel `jit_kernels.sparse` used by tutel_fast_dispatch.py:15-130).

Semantics reproduced (batched/capacity-padded dispatcher):
  * dispatch (encode):  dispatched[e, loc] = sum_k gate?_k * x[token]
                        for each (token, k) with indices[k,token]==e and
                        locations[k,token] < capacity; overflow tokens are
                        DROPPED (slot never written — stays zero).
  * combine  (decode):  y[token] = sum_k gate?_k * dispatched[e_k, loc_k],
                        zero contribution for dropped (token, k) pairs.
  * gate multiply is applied on encode when is_postscore=False, on decode
    when is_postscore=True, and nowhere when no_score=True
    (tutel_fast_dispatch.py:117-127).

TPU-first design: instead of scattering S x M rows (atomicAdd in the CUDA
kernel), we scatter only the S int32 slot indices to build a slot->token map,
then GATHER token rows into the [E*C, M] buffer. Gathers are
bandwidth-optimal on TPU and differentiate cleanly: JAX autodiff of the
gather + multiply yields exactly the reference's backward-data (gather) and
backward-gate (row dot-product) kernels for free. For top-1 (the Switch-NeRF
default) slot indices are unique so no collision handling is needed beyond
the trash row.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from switch_nerf_tpu.ops.routing import RoutingPlan

__all__ = [
    "DispatchPlan", "build_dispatch_plan", "dispatch", "combine",
    "dispatch_einsum_oracle", "combine_einsum_oracle",
]


class DispatchPlan(NamedTuple):
    """Precomputed index sets for one dispatch/combine pair.

    slot:          [K, S] int32  flat slot e*C+loc per (k, token); ==E*C if dropped
    kept:          [K, S] bool   location < capacity
    slot_to_token: [K, E*C] int32  token feeding each slot; ==S if slot empty
    filled:        [K, E*C] bool  slot occupancy
    gates:         [K, S] f32    gate scores (from the routing plan)
    num_experts:   int
    capacity:      int
    """
    slot: jnp.ndarray
    kept: jnp.ndarray
    slot_to_token: jnp.ndarray
    filled: jnp.ndarray
    gates: jnp.ndarray
    num_experts: int
    capacity: int


def build_dispatch_plan(plan: RoutingPlan, num_experts: int) -> DispatchPlan:
    k, s = plan.indices.shape
    cap = int(plan.capacity)
    ec = num_experts * cap

    kept = plan.locations < cap                                     # [K, S]
    slot = jnp.where(kept, plan.indices * cap + plan.locations, ec)  # [K, S]

    token_ids = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (k, s))
    # scatter int32 token ids into slot->token map (one extra trash row).
    slot_to_token = jnp.full((k, ec + 1), s, dtype=jnp.int32)
    slot_to_token = jax.vmap(lambda stt, sl, ti: stt.at[sl].set(ti, mode="drop"))(
        slot_to_token, slot, token_ids)
    slot_to_token = slot_to_token[:, :ec]
    filled = slot_to_token < s
    slot_to_token = jnp.where(filled, slot_to_token, 0)

    return DispatchPlan(slot=slot, kept=kept, slot_to_token=slot_to_token,
                        filled=filled, gates=plan.gates,
                        num_experts=num_experts, capacity=cap)


def dispatch(tokens: jnp.ndarray, dp: DispatchPlan, *, is_postscore: bool = True,
             no_score: bool = False) -> jnp.ndarray:
    """tokens [S, M] -> dispatched [E, C, M] (K summed into slots).

    With top-1, each slot receives at most one token. For K>1 the per-k slot
    ranges are disjoint by construction (locations of k>0 are offset by the
    cumulative counts of earlier k; tutel_fast_dispatch.py:196-202), so a
    plain sum over k is exact.
    """
    kk, ec = dp.slot_to_token.shape
    m = tokens.shape[-1]
    gathered = tokens[dp.slot_to_token.reshape(-1)].reshape(kk, ec, m)
    scale = dp.filled.astype(tokens.dtype)
    if not (is_postscore or no_score):
        gate_per_slot = jax.vmap(lambda g, stt: g[stt])(
            dp.gates.astype(tokens.dtype), dp.slot_to_token)        # [K, E*C]
        scale = scale * gate_per_slot
    out = jnp.sum(gathered * scale[..., None], axis=0)              # [E*C, M]
    return out.reshape(dp.num_experts, dp.capacity, m)


def combine(expert_output: jnp.ndarray, dp: DispatchPlan, *,
            is_postscore: bool = True, no_score: bool = False) -> jnp.ndarray:
    """expert_output [E, C, M] -> combined [S, M]."""
    ec = dp.num_experts * dp.capacity
    m = expert_output.shape[-1]
    flat = expert_output.reshape(ec, m)
    safe_slot = jnp.clip(dp.slot, 0, ec - 1)                        # [K, S]
    rows = flat[safe_slot.reshape(-1)].reshape(*dp.slot.shape, m)   # [K, S, M]
    scale = dp.kept.astype(flat.dtype)
    if is_postscore and not no_score:
        scale = scale * dp.gates.astype(flat.dtype)
    return jnp.sum(rows * scale[..., None], axis=0)                 # [S, M]


# ----------------------------------------------------------------------------
# Dense einsum oracle (Switch-Transformer / Mesh-TF formulation). O(S*E*C*M):
# only usable at test scale, but bitwise-checkable against the gather path.
# ----------------------------------------------------------------------------

def _dispatch_mask(dp: DispatchPlan, dtype) -> jnp.ndarray:
    """[K, S, E, C] one-hot dispatch tensor."""
    e, c = dp.num_experts, dp.capacity
    idx = dp.slot  # [K, S] flat (==E*C when dropped)
    oh = jax.nn.one_hot(idx, e * c, dtype=dtype)  # dropped -> all-zero row? one_hot of E*C over E*C classes = zeros
    return oh.reshape(*idx.shape, e, c)


def dispatch_einsum_oracle(tokens: jnp.ndarray, dp: DispatchPlan, *,
                           is_postscore: bool = True, no_score: bool = False) -> jnp.ndarray:
    mask = _dispatch_mask(dp, tokens.dtype)  # [K, S, E, C]
    if not (is_postscore or no_score):
        mask = mask * dp.gates.astype(tokens.dtype)[..., None, None]
    return jnp.einsum("ksec,sm->ecm", mask, tokens,
                      precision=jax.lax.Precision.HIGHEST)


def combine_einsum_oracle(expert_output: jnp.ndarray, dp: DispatchPlan, *,
                          is_postscore: bool = True, no_score: bool = False) -> jnp.ndarray:
    mask = _dispatch_mask(dp, expert_output.dtype)
    if is_postscore and not no_score:
        mask = mask * dp.gates.astype(expert_output.dtype)[..., None, None]
    return jnp.einsum("ksec,ecm->sm", mask, expert_output,
                      precision=jax.lax.Precision.HIGHEST)
