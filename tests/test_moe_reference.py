"""Mask-based oracle MoE vs the production MoELayer (nodrop + padded)."""
import jax
import jax.numpy as jnp
import numpy as np

from switch_nerf_tpu.models.moe import MoELayer
from switch_nerf_tpu.models.moe_reference import MaskedMoELayer


def _common(s=64, m=16, e=4, seed=0):
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (s, m), jnp.float32)
    ref = MaskedMoELayer(model_dim=m, num_experts=e, layer_num=2, skips=(1,))
    ref_params = ref.init(jax.random.PRNGKey(1), x)["params"]
    return x, ref, ref_params


def _transplant(ref_params):
    """The oracle and MoELayer share parameter structure (wg + experts)."""
    return ref_params


def test_oracle_matches_nodrop():
    x, ref, params = _common()
    y_ref, laux_ref, _ = ref.apply({"params": params}, x)

    moe = MoELayer(model_dim=16, num_experts=4, layer_num=2, skips=(1,),
                   top_k=1, train_dispatch="nodrop", eval_dispatch="nodrop")
    y, laux, _ = moe.apply({"params": _transplant(params)}, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(laux_ref), float(laux), rtol=1e-6)


def test_oracle_matches_padded_allfit():
    """Capacity large enough that nothing drops -> padded == oracle."""
    x, ref, params = _common()
    y_ref, laux_ref, _ = ref.apply({"params": params}, x)

    moe = MoELayer(model_dim=16, num_experts=4, layer_num=2, skips=(1,),
                   top_k=1, capacity_factor=4.0,
                   train_dispatch="padded", eval_dispatch="padded")
    y, laux, _ = moe.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(laux_ref), float(laux), rtol=1e-6)


def test_oracle_prescore():
    x, _, _ = _common()
    ref = MaskedMoELayer(model_dim=16, num_experts=4, layer_num=1,
                         is_postscore=False)
    params = ref.init(jax.random.PRNGKey(2), x)["params"]
    y_ref, _, _ = ref.apply({"params": params}, x)
    moe = MoELayer(model_dim=16, num_experts=4, layer_num=1, top_k=1,
                   capacity_factor=4.0, is_postscore=False)
    y, _, _ = moe.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y),
                               rtol=1e-4, atol=1e-6)


def test_oracle_gradients_match():
    x, ref, params = _common()
    moe = MoELayer(model_dim=16, num_experts=4, layer_num=2, skips=(1,),
                   top_k=1, capacity_factor=4.0)

    def loss_ref(p):
        y, laux, _ = ref.apply({"params": p}, x)
        return jnp.sum(y ** 2) + laux

    def loss_moe(p):
        y, laux, _ = moe.apply({"params": p}, x)
        return jnp.sum(y ** 2) + laux

    g_ref = jax.grad(loss_ref)(params)
    g_moe = jax.grad(loss_moe)(params)
    flat_r = jax.tree_util.tree_leaves(g_ref)
    flat_m = jax.tree_util.tree_leaves(g_moe)
    for a, b in zip(flat_r, flat_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
