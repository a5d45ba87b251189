"""Routing + dispatch correctness against a naive mask-based oracle.

The oracle re-derives the reference semantics (capacity-padded Tutel
dispatcher, tutel_fast_dispatch.py:176-217 + sparse kernels) with plain numpy
loops; the gather formulation and the einsum formulation must both match it,
including BPR ordering, capacity drops, pre/post-score, and top-2 gate
normalization.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from switch_nerf_tpu.ops import (
    extract_critical, build_dispatch_plan, dispatch, combine,
    dispatch_einsum_oracle, combine_einsum_oracle, compute_capacity,
)


def naive_route(gates, top_k, capacity, bpr):
    """Returns per-(k, token): expert, location; and dropped flags."""
    s, e = gates.shape
    order = np.argsort(-gates, axis=1, kind="stable")
    topk_idx = order[:, :top_k]  # [S, K]
    gk = np.take_along_axis(gates, topk_idx, axis=1)  # [S, K]

    if bpr:
        priority = np.argsort(-gates.max(axis=1), kind="stable")
    else:
        priority = np.arange(s)

    # locations for k=0 assigned in priority order; k>0 offset by total count of k-1
    loc = np.zeros((s, top_k), dtype=np.int64)
    counts_prev = np.zeros(e, dtype=np.int64)
    for k in range(top_k):
        ctr = np.zeros(e, dtype=np.int64)
        for tok in priority:
            ex = topk_idx[tok, k]
            loc[tok, k] = ctr[ex] + counts_prev[ex]
            ctr[ex] += 1
        counts_prev += np.bincount(topk_idx[:, k], minlength=e)
    if top_k > 1:
        denom = np.clip(gk.sum(axis=1, keepdims=True), np.finfo(np.float32).eps, None)
        gk = gk / denom
    return topk_idx, loc, gk


def naive_moe(x, gates, top_k, capacity_factor, bpr, expert_fn, is_postscore):
    s, e = gates.shape
    cap = compute_capacity(s, e, top_k, capacity_factor)
    topk_idx, loc, gk = naive_route(gates, top_k, cap, bpr)
    disp = np.zeros((e, cap, x.shape[1]), dtype=np.float64)
    for k in range(top_k):
        for tok in range(s):
            ex, l = topk_idx[tok, k], loc[tok, k]
            if l < cap:
                g = 1.0 if is_postscore else gk[tok, k]
                disp[ex, l] += g * x[tok]
    y = expert_fn(disp)
    out = np.zeros_like(x, dtype=np.float64)
    for k in range(top_k):
        for tok in range(s):
            ex, l = topk_idx[tok, k], loc[tok, k]
            if l < cap:
                g = gk[tok, k] if is_postscore else 1.0
                out[tok] += g * y[ex, l]
    return out, disp


@pytest.mark.parametrize("top_k", [1, 2])
@pytest.mark.parametrize("bpr", [False, True])
@pytest.mark.parametrize("cf", [1.0, 0.5, 2.0])
@pytest.mark.parametrize("is_postscore", [True, False])
def test_dispatch_combine_vs_oracle(top_k, bpr, cf, is_postscore):
    rng = np.random.RandomState(42)
    s, e, m = 64, 4, 8
    logits = rng.randn(s, e).astype(np.float32)
    gates = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    x = rng.randn(s, m).astype(np.float32)

    plan, l_aux = extract_critical(jnp.asarray(gates), top_k, cf,
                                   batch_prioritized_routing=bpr)
    dp = build_dispatch_plan(plan, e)

    disp = dispatch(jnp.asarray(x), dp, is_postscore=is_postscore)
    y = np.tanh(np.asarray(disp, dtype=np.float64))  # fake expert
    out = combine(jnp.asarray(y, dtype=jnp.float32), dp, is_postscore=is_postscore)

    want_out, want_disp = naive_moe(
        x.astype(np.float64), gates.astype(np.float64), top_k, cf, bpr,
        lambda d: np.tanh(d), is_postscore)

    np.testing.assert_allclose(np.asarray(disp), want_disp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), want_out, rtol=1e-4, atol=1e-5)

    # einsum oracle agrees with gather formulation
    disp2 = dispatch_einsum_oracle(jnp.asarray(x), dp, is_postscore=is_postscore)
    out2 = combine_einsum_oracle(jnp.asarray(y, dtype=jnp.float32), dp,
                                 is_postscore=is_postscore)
    np.testing.assert_allclose(np.asarray(disp2), np.asarray(disp), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("s,e", [(16, 1), (3, 8)])
def test_dispatch_edge_shapes(s, e):
    """Degenerate shapes the reference tolerates implicitly: a single
    expert (E=1 — dense equivalence) and fewer tokens than experts
    (S<E — most experts empty; capacity still >= 1)."""
    rng = np.random.RandomState(0)
    m = 8
    logits = rng.randn(s, e).astype(np.float32)
    gates = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    x = rng.randn(s, m).astype(np.float32)

    plan, l_aux = extract_critical(jnp.asarray(gates), 1, 1.0,
                                   batch_prioritized_routing=True)
    dp = build_dispatch_plan(plan, e)
    disp = dispatch(jnp.asarray(x), dp)
    out = combine(jnp.tanh(disp), dp)

    want_out, want_disp = naive_moe(
        x.astype(np.float64), gates.astype(np.float64), 1, 1.0, True,
        lambda d: np.tanh(d), True)
    np.testing.assert_allclose(np.asarray(disp), want_disp,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), want_out,
                               rtol=1e-4, atol=1e-5)
    assert np.isfinite(float(l_aux))


def test_load_balance_value():
    # perfectly balanced top-1 on 2 experts with uniform gates -> loss = 1.0
    s, e = 8, 2
    gates = np.full((s, e), 0.5, dtype=np.float32)
    gates[:, 0] += np.linspace(-.01, .01, s)  # tie-break: half to each expert
    gates = gates / gates.sum(1, keepdims=True)
    plan, l_aux = extract_critical(jnp.asarray(gates), 1, 1.0)
    assert abs(float(l_aux) - 1.0) < 0.05


def test_capacity_static():
    assert compute_capacity(64, 4, 1, 1.0) == 16
    assert compute_capacity(65, 4, 1, 1.0) == 17
    assert compute_capacity(64, 4, 2, 1.25) == 40
    assert compute_capacity(64, 4, 1, 0.0) == 64   # all-fit upper bound
    assert compute_capacity(64, 4, 1, -0.5) == 8


def test_drops_zero_output():
    """Overflowed tokens must produce exactly zero output rows (top-1)."""
    s, e, m = 16, 2, 4
    gates = np.zeros((s, e), dtype=np.float32)
    gates[:, 0] = 0.9
    gates[:, 1] = 0.1  # everyone routes to expert 0
    x = np.ones((s, m), dtype=np.float32)
    plan, _ = extract_critical(jnp.asarray(gates), 1, 1.0)  # cap = 8
    dp = build_dispatch_plan(plan, e)
    disp = dispatch(jnp.asarray(x), dp)
    out = combine(disp, dp)
    out = np.asarray(out)
    # first 8 tokens kept (arrival order, no BPR), rest dropped
    np.testing.assert_allclose(out[:8], 0.9 * np.ones((8, m)), rtol=1e-5)
    np.testing.assert_allclose(out[8:], 0.0, atol=1e-7)


def test_gradients_flow_and_match_oracle():
    """Autodiff through gather dispatch == autodiff through einsum oracle."""
    rng = np.random.RandomState(7)
    s, e, m = 32, 4, 8
    x = jnp.asarray(rng.randn(s, m).astype(np.float32))
    wg = jnp.asarray(rng.randn(m, e).astype(np.float32) * 0.1)
    w_exp = jnp.asarray(rng.randn(e, m, m).astype(np.float32) * 0.1)

    def moe(params, use_oracle):
        wg_, w_ = params
        gates = jax.nn.softmax(x @ wg_, axis=-1)
        plan, l_aux = extract_critical(gates, 1, 1.25)
        dp = build_dispatch_plan(plan, e)
        d = (dispatch_einsum_oracle if use_oracle else dispatch)(x, dp)
        y = jnp.einsum("ecm,emn->ecn", d, w_)
        out = (combine_einsum_oracle if use_oracle else combine)(y, dp)
        return jnp.sum(out ** 2) + l_aux

    g1 = jax.grad(moe)((wg, w_exp), False)
    g2 = jax.grad(moe)((wg, w_exp), True)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    assert any(float(jnp.abs(l).sum()) > 0 for l in jax.tree_util.tree_leaves(g1))


@pytest.mark.parametrize("top_k", [1, 2])
@pytest.mark.parametrize("bpr", [False, True])
@pytest.mark.parametrize("cf", [1.0, 0.5])
@pytest.mark.parametrize("seed,skew", [(7, 0.0), (13, 0.0), (3, 6.0)])
def test_sorted_inverse_slot_map_matches_scatter(monkeypatch, top_k, bpr, cf,
                                                 seed, skew):
    """The opt-in sort-based inverse map (SWITCH_NERF_SORTED_INVERSE=1) is
    bit-identical to the production scatter, incl. top-2 offset runs and
    capacity drops (see _inverse_slot_map_sorted's measured A/B docstring).

    The skew=6 case biases all logits toward expert 0 so that other experts
    receive zero tokens (k_e == 0) and the dominant expert overflows far past
    capacity (start >= cap for later k in top-2), covering both corner
    branches of _inverse_slot_map_sorted. The knob is read ONCE at module
    import (jit caches are keyed on avals, not env), so the test flips the
    module constant directly.
    """
    import importlib
    dispatch_mod = importlib.import_module("switch_nerf_tpu.ops.dispatch")
    rng = np.random.RandomState(seed)
    s, e = 96, 4
    logits = rng.randn(s, e).astype(np.float32)
    logits[:, 0] += skew
    gates = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    plan, _ = extract_critical(jnp.asarray(gates), top_k, cf,
                               batch_prioritized_routing=bpr)
    if skew:  # the corner case must actually be a corner case
        counts = np.bincount(np.asarray(plan.indices).ravel(), minlength=e)
        assert counts.max() > plan.capacity          # start >= cap overflow
        if top_k == 1:                               # k_e == 0 empty expert
            assert counts.min() == 0

    dp_scatter = build_dispatch_plan(plan, e)
    monkeypatch.setattr(dispatch_mod, "_SORTED_INVERSE", True)
    dp_sorted = build_dispatch_plan(plan, e)

    np.testing.assert_array_equal(np.asarray(dp_sorted.slot_to_token),
                                  np.asarray(dp_scatter.slot_to_token))
    np.testing.assert_array_equal(np.asarray(dp_sorted.filled),
                                  np.asarray(dp_scatter.filled))
