"""Fused expert-chain Pallas kernel vs the einsum reference path.

Values AND grads (x, W, b) must agree with ExpertMLP's einsum chain for
every skip configuration the model graphs use (interpret mode — the
compiled kernel is exercised on real TPU by bench.py).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from switch_nerf_tpu.ops.expert_kernel import expert_mlp_chain


def einsum_chain(x, ws, bs, skips):
    """The ExpertMLP padded-form math (models/experts.py:66-77)."""
    layers = ws.shape[0]
    h = x
    xin = x
    for l in range(layers):
        h = jnp.einsum("ecm,emn->ecn", h, ws[l],
                       preferred_element_type=jnp.float32).astype(h.dtype)
        h = h + bs[l]
        last = l == layers - 1
        if l in set(skips):
            h = h + xin
            if not last:
                h = jax.nn.relu(h)
            xin = h
        elif not last:
            h = jax.nn.relu(h)
    return h


@pytest.mark.parametrize("layers,skips", [
    (1, ()), (2, ()), (3, (1,)), (4, (1, 3)), (3, (2,)),  # incl. last-layer skip
])
@pytest.mark.parametrize("dtype", [jnp.float32])
def test_expert_kernel_matches_einsum(layers, skips, dtype):
    e, c, m = 2, 64, 128
    rng = np.random.default_rng(layers * 10 + len(skips))
    x = jnp.asarray(rng.normal(0, 1, (e, c, m)), dtype)
    ws = jnp.asarray(rng.normal(0, 0.1, (layers, e, m, m)), dtype)
    bs = jnp.asarray(rng.normal(0, 0.1, (layers, e, 1, m)), dtype)
    dy = jnp.asarray(rng.normal(0, 1, (e, c, m)), dtype)

    kern = functools.partial(expert_mlp_chain, skips=tuple(skips),
                             interpret=True)
    y_k = kern(x, ws, bs)
    y_r = einsum_chain(x, ws, bs, skips)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(y_r),
                               rtol=1e-5, atol=1e-5)

    def loss_k(x, ws, bs):
        return jnp.sum(kern(x, ws, bs) * dy)

    def loss_r(x, ws, bs):
        return jnp.sum(einsum_chain(x, ws, bs, skips) * dy)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, ws, bs)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, ws, bs)
    for a, b, name in zip(gk, gr, ("dx", "dW", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_expert_kernel_bf16_blocked():
    """bf16 path with C split into multiple blocks (accumulated dW)."""
    e, c, m = 4, 4096, 128            # c > block target -> multi-block grid
    layers, skips = 3, (1,)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (e, c, m)), jnp.bfloat16)
    ws = jnp.asarray(rng.normal(0, 0.1, (layers, e, m, m)), jnp.bfloat16)
    bs = jnp.asarray(rng.normal(0, 0.1, (layers, e, 1, m)), jnp.bfloat16)
    dy = jnp.ones((e, c, m), jnp.bfloat16)

    kern = functools.partial(expert_mlp_chain, skips=skips, interpret=True)
    y_k = kern(x, ws, bs)
    y_r = einsum_chain(x, ws, bs, skips)
    np.testing.assert_allclose(np.asarray(y_k, np.float32),
                               np.asarray(y_r, np.float32),
                               rtol=2e-2, atol=2e-2)
    gk = jax.grad(lambda *a: jnp.sum(kern(*a).astype(jnp.float32)),
                  argnums=(0, 1, 2))(x, ws, bs)
    gr = jax.grad(lambda *a: jnp.sum(
        einsum_chain(*a, skips).astype(jnp.float32)),
        argnums=(0, 1, 2))(x, ws, bs)
    for a, b, name in zip(gk, gr, ("dx", "dW", "db")):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-1, err_msg=name)
