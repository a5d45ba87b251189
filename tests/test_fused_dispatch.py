"""Fused dispatch+expert-chain kernel (ops/fused_dispatch) — value AND
gradient parity against the production padded path (dispatch gather ->
einsum chain), through the whole MoELayer, drops included.

Runs in Pallas interpret mode on CPU (the kernel auto-selects it off-TPU).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from switch_nerf_tpu.models.moe import MoELayer


def _layer():
    return MoELayer(model_dim=128, num_experts=4, layer_num=3, skips=(1,),
                    top_k=1, capacity_factor=1.0,
                    batch_prioritized_routing=True,
                    train_dispatch="padded", eval_dispatch="padded")


def _data(s=64, m=128, seed=3):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, (s, m)).astype(np.float32)
    # skewed gate input so routing is unbalanced -> capacity drops happen
    gi = rng.normal(0, 1, (s, m)).astype(np.float32)
    gi[: s // 2] += 1.5
    return jnp.asarray(x), jnp.asarray(gi)


def test_fused_dispatch_matches_padded_path(monkeypatch):
    x, gi = _data()
    layer = _layer()
    params = layer.init(jax.random.PRNGKey(0), x, gi)
    w_out = jnp.asarray(
        np.random.default_rng(7).normal(0, 1, x.shape).astype(np.float32))

    def loss(p, xx):
        y, l_aux, _ = layer.apply(p, xx, gi, deterministic=False)
        return jnp.sum(y * w_out) + l_aux

    monkeypatch.setenv("SWITCH_NERF_FUSED_DISPATCH", "0")
    v0, (gp0, gx0) = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
    monkeypatch.setenv("SWITCH_NERF_FUSED_DISPATCH", "1")
    v1, (gp1, gx1) = jax.value_and_grad(loss, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0),
                               rtol=1e-5, atol=1e-5)
    flat0 = jax.tree_util.tree_leaves_with_path(gp0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(gp1))
    assert flat1
    for path, leaf in flat0:
        np.testing.assert_allclose(
            np.asarray(flat1[path]), np.asarray(leaf),
            rtol=1e-5, atol=1e-5, err_msg=str(path))


def test_fused_dispatch_drops_match(monkeypatch):
    """Severely over-capacity routing: dropped tokens' outputs must be
    identical (zero contribution) on both paths."""
    x, gi = _data(seed=11)
    gi = gi.at[:, :].add(3.0 * jnp.ones_like(gi))   # everyone loves e0
    layer = _layer()
    params = layer.init(jax.random.PRNGKey(1), x, gi)

    def run(p, xx):
        y, _, _ = layer.apply(p, xx, gi, deterministic=True)
        return y

    monkeypatch.setenv("SWITCH_NERF_FUSED_DISPATCH", "0")
    y0 = run(params, x)
    monkeypatch.setenv("SWITCH_NERF_FUSED_DISPATCH", "1")
    y1 = run(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-5, atol=1e-6)


def test_fused_gating_conditions():
    """The fused path only engages where its static conditions hold."""
    from switch_nerf_tpu.ops.fused_dispatch import fused_supported
    assert fused_supported((16384, 256), 8, 2048, 7)
    assert not fused_supported((16384, 192), 8, 2048, 7)   # m % 128
    assert not fused_supported((16384, 256), 8, 2049, 7)   # cap % 8
    assert not fused_supported((10 ** 7, 256), 8, 2048, 7)  # VMEM blowout
