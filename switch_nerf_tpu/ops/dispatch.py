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

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from switch_nerf_tpu.ops.routing import RoutingPlan

# A/B knob (measured 7.4% SLOWER end-to-end; see _inverse_slot_map_sorted).
# Read ONCE at import: build_dispatch_plan runs at trace time, and the jit
# cache is keyed on avals, not env — toggling after the first compile would
# silently compare two identical programs. Set before importing to flip.
_SORTED_INVERSE = os.environ.get("SWITCH_NERF_SORTED_INVERSE", "0") == "1"

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


def _inverse_slot_map_sorted(slot_k: jnp.ndarray, num_experts: int,
                             cap: int, s: int) -> jnp.ndarray:
    """slot->token map via ONE multi-operand sort instead of a scatter.

    XLA lowers the int32 scatter to a serial per-element store (~76 us for
    16k elements on v5e — 4% of the bg-on train step). The kept slots of
    each expert are CONTIGUOUS (locations are cumsum arrival ranks, so the
    kept ones form [start_e, start_e + k_e) with start_e = 0 for top-1 and
    the k>0 rows offset by the earlier-k counts), so sorting (slot, token)
    once yields each expert's queue as a contiguous run whose position is
    a tiny per-expert cumsum — the dense map is then a structured gather.

    MEASURED (r4, v5e): standalone ~25% faster than the scatter (207 vs
    280 us chained), but END-TO-END the bg-on train step is 7.4% SLOWER
    (11,086 vs 11,970 rays/s): in-graph the scatter fuses with its
    select+iota producers (one kCustom fusion) while the sort blocks
    fusion and adds an unfusable 16k s32 gather. Same pattern as the
    fused-dispatch kernel negative result — kept as an opt-in A/B knob
    (SWITCH_NERF_SORTED_INVERSE=1), scatter stays production.
    """
    token_ids = jnp.arange(s, dtype=jnp.int32)
    ks, toks = jax.lax.sort((slot_k, token_ids), dimension=0, num_keys=1)
    bounds = jnp.arange(num_experts + 1, dtype=jnp.int32) * cap     # [E+1]
    below = jnp.sum(slot_k[None, :] < bounds[:, None], axis=1)      # [E+1]
    k_e = below[1:] - below[:-1]                                    # kept per expert
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(k_e)[:-1]])                  # run starts in ks
    start = jnp.where(k_e > 0,
                      ks[jnp.clip(base, 0, s - 1)] - bounds[:-1], 0)  # [E]
    c = jnp.arange(cap, dtype=jnp.int32)[None, :]                   # [1, C]
    idx = base[:, None] + (c - start[:, None])                      # [E, C]
    valid = (c >= start[:, None]) & (c < (start + k_e)[:, None])
    stt = jnp.where(valid, toks[jnp.clip(idx, 0, s - 1)],
                    jnp.int32(s))
    return stt.reshape(-1)                                          # [E*C]


def build_dispatch_plan(plan: RoutingPlan, num_experts: int) -> DispatchPlan:
    from jax.ad_checkpoint import checkpoint_name
    k, s = plan.indices.shape
    cap = int(plan.capacity)
    ec = num_experts * cap

    kept = plan.locations < cap                                     # [K, S]
    slot = jnp.where(kept, plan.indices * cap + plan.locations, ec)  # [K, S]

    if _SORTED_INVERSE:
        # sort-based A/B variant; measured 7.4% slower end-to-end (docstring)
        slot_to_token = jax.vmap(
            lambda sl: _inverse_slot_map_sorted(sl, num_experts, cap, s))(slot)
    else:
        token_ids = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (k, s))
        slot_to_token = jnp.full((k, ec + 1), s, dtype=jnp.int32)
        slot_to_token = jax.vmap(
            lambda stt, sl, ti: stt.at[sl].set(ti, mode="drop"))(
                slot_to_token, slot, token_ids)
        slot_to_token = slot_to_token[:, :ec]
    filled = slot_to_token < s
    slot_to_token = jnp.where(filled, slot_to_token, 0)

    # mark routing decisions as remat-saveable: recomputing the sorts /
    # cumsums / scatters in the backward pass costs far more than the few
    # MB of int32 state (policy applied in render.run_model_chunked)
    slot = checkpoint_name(slot, "moe_plan")
    kept = checkpoint_name(kept, "moe_plan")
    slot_to_token = checkpoint_name(slot_to_token, "moe_plan")
    filled = checkpoint_name(filled, "moe_plan")

    return DispatchPlan(slot=slot, kept=kept, slot_to_token=slot_to_token,
                        filled=filled,
                        gates=checkpoint_name(plan.gates, "moe_plan"),
                        num_experts=num_experts, capacity=cap)


def dispatch(tokens: jnp.ndarray, dp: DispatchPlan, *, is_postscore: bool = True,
             no_score: bool = False) -> jnp.ndarray:
    """tokens [S, M] -> dispatched [E, C, M] (K summed into slots).

    With top-1, each slot receives at most one token. For K>1 the per-k slot
    ranges are disjoint by construction (locations of k>0 are offset by the
    cumulative counts of earlier k; tutel_fast_dispatch.py:196-202), so a
    plain sum over k is exact.

    custom_vjp: the slot<->token maps are inverse partial permutations, so
    the transpose (normally an XLA scatter-add — slow on TPU) is realised as
    a GATHER by the inverse map in both directions. This is the TPU analog
    of the reference's hand-written backward-data/backward-gate CUDA kernels
    (tutel_sparse_nobatch.py:38-134), obtained structurally instead.
    """
    prescore = not (is_postscore or no_score)
    out = _dispatch_p(tokens, dp.gates, dp.slot, dp.kept, dp.slot_to_token,
                      dp.filled, prescore)
    return out.reshape(dp.num_experts, dp.capacity, tokens.shape[-1])


def combine(expert_output: jnp.ndarray, dp: DispatchPlan, *,
            is_postscore: bool = True, no_score: bool = False) -> jnp.ndarray:
    """expert_output [E, C, M] -> combined [S, M] (gather-only VJP)."""
    postscore = is_postscore and not no_score
    ec = dp.num_experts * dp.capacity
    flat = expert_output.reshape(ec, expert_output.shape[-1])
    return _combine_p(flat, dp.gates, dp.slot, dp.kept, dp.slot_to_token,
                      dp.filled, postscore)


# ---- dispatch primitive -----------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _dispatch_p(tokens, gates, slot, kept, stt, filled, prescore):
    return _dispatch_fwd_impl(tokens, gates, stt, filled, prescore)


def _dispatch_fwd_impl(tokens, gates, stt, filled, prescore):
    kk, ec = stt.shape
    m = tokens.shape[-1]
    scale = filled.astype(tokens.dtype)
    if prescore:
        # multiply the gate on the TOKEN side before gathering — avoids a
        # separate per-slot gate gather (tiny dynamic gathers are slow)
        out = None
        for k in range(kk):
            scaled = tokens * gates[k, :, None].astype(tokens.dtype)
            g = scaled[stt[k]] * scale[k][:, None]
            out = g if out is None else out + g
        return out
    gathered = tokens[stt.reshape(-1)].reshape(kk, ec, m)
    return jnp.sum(gathered * scale[..., None], axis=0)             # [E*C, M]


def _dispatch_fwd(tokens, gates, slot, kept, stt, filled, prescore):
    out = _dispatch_fwd_impl(tokens, gates, stt, filled, prescore)
    return out, (tokens, gates, slot, kept, stt, filled)


def _dispatch_bwd(prescore, res, g):
    tokens, gates, slot, kept, stt, filled = res
    kk, s = slot.shape
    ec, m = g.shape[0], g.shape[-1]
    g_ext = jnp.concatenate([g, jnp.zeros((1, m), g.dtype)], axis=0)
    rows = g_ext[slot.reshape(-1)].reshape(kk, s, m)                # [K, S, M]
    keptf = kept.astype(g.dtype)
    if prescore:
        d_tokens = jnp.sum(
            rows * (keptf * gates.astype(g.dtype))[..., None], axis=0)
        d_gates = jnp.einsum("ksm,sm->ks", rows, tokens,
                             preferred_element_type=jnp.float32) * kept
    else:
        d_tokens = jnp.sum(rows * keptf[..., None], axis=0)
        d_gates = jnp.zeros_like(gates)
    return (d_tokens.astype(tokens.dtype), d_gates.astype(gates.dtype),
            None, None, None, None)


_dispatch_p.defvjp(_dispatch_fwd, _dispatch_bwd)


# ---- combine primitive ------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _combine_p(flat, gates, slot, kept, stt, filled, postscore):
    """Gather expert rows in their native dtype (bf16 traffic), then apply
    the gate scale with fp32 accumulation — matches the reference's fp32
    decode (tutel_fast_dispatch.py:106-114) without fp32 gather traffic."""
    ec, m = flat.shape
    flat_ext = jnp.concatenate([flat, jnp.zeros((1, m), flat.dtype)], axis=0)
    rows = flat_ext[slot.reshape(-1)].reshape(*slot.shape, m)       # [K, S, M]
    scale = kept.astype(jnp.float32)
    if postscore:
        scale = scale * gates.astype(jnp.float32)
    return jnp.sum(rows.astype(jnp.float32) * scale[..., None], axis=0)


def _combine_fwd(flat, gates, slot, kept, stt, filled, postscore):
    return (_combine_p(flat, gates, slot, kept, stt, filled, postscore),
            (flat, gates, slot, kept, stt, filled))


def _combine_bwd(postscore, res, d_y):
    flat, gates, slot, kept, stt, filled = res
    kk, ec = stt.shape
    m = d_y.shape[-1]
    # d_flat[slot] = d_y[token] * scale  ==  gather d_y by slot->token;
    # gather in the (bf16) expert dtype; gate multiply on the token side
    # (avoids a per-slot gate gather)
    d_y_lo = d_y.astype(flat.dtype)
    d_flat = None
    for k in range(kk):
        src = d_y_lo
        if postscore:
            src = src * gates[k, :, None].astype(flat.dtype)
        g = src[stt[k]] * filled[k][:, None].astype(flat.dtype)
        d_flat = g if d_flat is None else d_flat + g
    if postscore:
        flat_ext = jnp.concatenate([flat, jnp.zeros((1, m), flat.dtype)], 0)
        sel = flat_ext[slot.reshape(-1)].reshape(*slot.shape, m)
        d_gates = jnp.einsum("ksm,sm->ks", sel, d_y_lo,
                             preferred_element_type=jnp.float32) * kept
    else:
        d_gates = jnp.zeros_like(gates)
    return (d_flat.astype(flat.dtype), d_gates.astype(gates.dtype),
            None, None, None, None)


_combine_p.defvjp(_combine_fwd, _combine_bwd)


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
