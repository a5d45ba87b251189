"""Top-k switch routing: locations, capacity, auxiliary losses.

Behavioral parity targets (reference file:line):
  * cumsum_sub_one          — tutel fast_cumsum_sub_one CUDA kernel (used at
                              switch_nerf/modules/tutel_moe_ext/tutel_fast_dispatch.py:190)
  * compute_sorted_location — tutel_fast_dispatch.py:136-139 (batch-prioritized routing)
  * load_balance            — tutel_fast_dispatch_nobatch.py:170-179
  * load_importance_loss    — tutel_fast_dispatch_nobatch.py:181-203
  * extract_critical        — tutel_fast_dispatch.py:176-217 (batched/capacity-padded
                              semantics; the nobatch variant differs only in also
                              returning per-expert counts, which we always provide)

TPU-first notes: everything here is static-shape jnp. The token count S is a
trace-time constant under jit, so `capacity` is a Python int — no dynamic
shapes reach XLA. The cumsum over the one-hot mask is a log-depth scan XLA
handles natively; no kernel needed.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "cumsum_sub_one", "compute_sorted_location", "load_balance",
    "load_importance_loss", "compute_capacity", "extract_critical",
    "RoutingPlan",
]


def cumsum_sub_one(mask: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along tokens minus one; [S, E] int32.

    For a one-hot mask this yields, at each (token, expert) with mask==1, the
    0-based arrival position of the token within that expert's queue.
    """
    return jnp.cumsum(mask.astype(jnp.int32), axis=0) - 1


def compute_sorted_location(mask: jnp.ndarray, importance_scores: jnp.ndarray) -> jnp.ndarray:
    """Batch-prioritized routing: positions assigned in importance order.

    importance_scores: [S]; lower = more important (reference passes
    -max_gate). Tokens are ranked by a stable sort of the scores, the
    per-expert cumsum runs in that order, and locations return to token
    order via a second sort — no gathers/scatters (argsort +
    mask[order] + sorted_loc[inv] lower to slow dynamic-gather fusions
    on TPU; multi-operand sorts carry the payloads through the sorting
    network instead).
    """
    s, e = mask.shape
    expert_of = jnp.argmax(mask, axis=1).astype(jnp.int32)       # [S]
    pos = jnp.arange(s, dtype=jnp.int32)
    # stable ascending sort by importance, carrying (expert id, token pos)
    _, _, expert_sorted, pos_sorted = jax.lax.sort(
        (importance_scores, pos, expert_of, pos), dimension=0, num_keys=2)
    sorted_mask = jax.nn.one_hot(expert_sorted, e, dtype=jnp.int32)
    loc_sorted = jnp.sum(cumsum_sub_one(sorted_mask) * sorted_mask,
                         axis=1).astype(jnp.int32)               # [S]
    # route back to token order
    _, loc = jax.lax.sort((pos_sorted, loc_sorted), dimension=0, num_keys=1)
    # [S] per-token location -> [S, E] masked matrix (same contract as the
    # cumsum-over-mask form: nonzero only at the token's expert column)
    return loc[:, None] * mask.astype(jnp.int32)


def load_balance(gates: jnp.ndarray, mask1: jnp.ndarray, num_global_experts: int) -> jnp.ndarray:
    """Switch load-balance loss: E * sum(me * ce) / S^2 (fp32).

    gates: [S, E] softmax probabilities; mask1: [S, E] top-1 one-hot.
    """
    s = gates.shape[0]
    me = jnp.sum(gates.astype(jnp.float32), axis=0)
    ce = jnp.sum(mask1.astype(jnp.float32), axis=0)
    return jnp.sum(me * ce) * (num_global_experts / float(s * s))


def _norm_cdf(x: jnp.ndarray, sigma: float) -> jnp.ndarray:
    return 0.5 * (1.0 + jax.lax.erf(x / (sigma * math.sqrt(2.0))))


def load_importance_loss(scores_wo_noise: jnp.ndarray, topk_logits: jnp.ndarray,
                         num_global_experts: int, gate_noise: float) -> jnp.ndarray:
    """(importance + load) / 2 loss from "Scaling Vision with Sparse MoE".

    gate_noise must be positive: the load estimate is a normal CDF with
    sigma = gate_noise / E (the reference's torch Normal raises on
    non-positive scale; a negative sigma here would silently invert the
    CDF and mis-balance experts).
    """
    if gate_noise <= 0:
        raise ValueError(
            "use_load_importance_loss requires --gate_noise > 0 "
            f"(got {gate_noise})")
    # ddof=1: torch.Tensor.var() is UNBIASED — the reference loss
    # (tutel_fast_dispatch_nobatch.py:181-203) would otherwise be
    # underestimated by (E-1)/E
    imp = scores_wo_noise.astype(jnp.float32).sum(axis=0)
    l_imp = imp.var(ddof=1) / (imp.mean() ** 2 + 1e-10)

    threshold = topk_logits[:, -1:].astype(jnp.float32)
    diff = scores_wo_noise.astype(jnp.float32) - threshold
    prob = _norm_cdf(diff, gate_noise / num_global_experts)
    load = prob.sum(axis=0)
    l_load = load.var(ddof=1) / (load.mean() ** 2 + 1e-10)
    return (l_imp + l_load) / 2.0


def compute_capacity(num_tokens: int, num_experts: int, top_k: int,
                     capacity_factor: float) -> int:
    """capacity = top_k * int(cf * ceil(S / E)); cf<=0 (all-fit) is resolved
    statically as S*top_k on TPU (the reference's runtime max + all-reduce is
    a dynamic shape, which XLA cannot express; S*top_k is a safe upper bound
    with identical numerics since unused slots are zero).
    """
    if capacity_factor > 0:
        return top_k * int(capacity_factor * ((num_tokens + num_experts - 1) // num_experts))
    cap = num_tokens * top_k
    if capacity_factor < 0:
        cap = min(cap, top_k * int(-capacity_factor * ((num_tokens + num_experts - 1) // num_experts)))
    return max(cap, 1)


class RoutingPlan(NamedTuple):
    """Static-shape routing decision for one MoE invocation.

    indices:   [K, S] int32   expert id per token per k
    locations: [K, S] int32   position within the expert queue (may be >= capacity => dropped)
    gates:     [K, S] f32     gate score per token per k (top-k normalized when K>1)
    expert_counts: [E] int32  tokens assigned per expert (pre-drop; k-aggregated)
    capacity:  int            per-expert slot count (python int, static)
    """
    indices: jnp.ndarray
    locations: jnp.ndarray
    gates: jnp.ndarray
    expert_counts: jnp.ndarray
    capacity: int


def extract_critical(gates: jnp.ndarray, top_k: int, capacity_factor: float = 1.0,
                     batch_prioritized_routing: bool = False,
                     num_experts: Optional[int] = None):
    """Top-k routing decision + load-balance loss.

    gates: [S, E] softmax probabilities (fp32 recommended).
    Returns (RoutingPlan, l_aux).
    """
    s, e = gates.shape
    num_experts = num_experts or e
    top_k = min(top_k, e)

    if top_k == 1:
        # argmax/max beat lax.top_k's sort lowering on TPU
        topk_idx = jnp.argmax(gates, axis=1, keepdims=True)
        topk_vals = jnp.max(gates, axis=1, keepdims=True)
    else:
        topk_vals, topk_idx = jax.lax.top_k(gates, top_k)   # [S, K]
    indices = jnp.transpose(topk_idx).astype(jnp.int32)  # [K, S]

    masks = jax.nn.one_hot(indices, e, dtype=jnp.int32)  # [K, S, E]
    gates_k = jnp.transpose(topk_vals).astype(jnp.float32)  # [K, S]

    l_aux = load_balance(gates, masks[0], num_experts)

    if batch_prioritized_routing:
        importance = -jnp.max(gates, axis=1)

        def loc_fn(m):
            return compute_sorted_location(m, importance)
    else:
        loc_fn = cumsum_sub_one

    loc0 = loc_fn(masks[0])                              # [S, E]
    locations = [jnp.sum(loc0 * masks[0], axis=1).astype(jnp.int32)]
    counts = jnp.sum(masks[0], axis=0).astype(jnp.int32)  # [E], pre-drop

    if top_k > 1:
        acc_base = jnp.zeros((1, e), jnp.int32)
        for k in range(1, top_k):
            acc_base = acc_base + jnp.sum(masks[k - 1], axis=0, keepdims=True)
            lock = loc_fn(masks[k]) + acc_base
            locations.append(jnp.sum(lock * masks[k], axis=1).astype(jnp.int32))
            counts = counts + jnp.sum(masks[k], axis=0).astype(jnp.int32)
        denom = jnp.clip(jnp.sum(gates_k, axis=0), min=jnp.finfo(jnp.float32).eps)
        gates_k = gates_k / denom

    capacity = compute_capacity(s, num_experts, top_k, capacity_factor)
    plan = RoutingPlan(
        indices=indices,
        locations=jnp.stack(locations),
        gates=gates_k,
        expert_counts=counts,
        capacity=capacity,
    )
    return plan, l_aux
