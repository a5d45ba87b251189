import jax
import jax.numpy as jnp
import numpy as np

from switch_nerf_tpu.models import ExpertMLP, MoELayer, NeRF, NeRFMoE


def test_expertmlp_padded_vs_ragged_vs_naive():
    e, c, m, L = 3, 8, 16, 3
    rng = np.random.RandomState(0)
    x = rng.randn(e, c, m).astype(np.float32)

    model = ExpertMLP(model_dim=m, num_experts=e, layer_num=L, skips=[1])
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y_pad = model.apply(params, jnp.asarray(x))

    # naive per-expert forward with same params
    p = params["params"]
    def naive_one(xe, eid):
        h = xe
        xin = xe
        for l in range(L):
            w = np.asarray(p[f"w{l}"][eid])
            b = np.asarray(p[f"b{l}"][eid])
            h = h @ w + b
            if l == 1:
                h = h + xin
                if l < L - 1:
                    h = np.maximum(h, 0)
                xin = h
            elif l < L - 1:
                h = np.maximum(h, 0)
        return h
    want = np.stack([naive_one(x[eid], eid) for eid in range(e)])
    np.testing.assert_allclose(np.asarray(y_pad), want, rtol=1e-4, atol=1e-5)

    # ragged form with equal group sizes must match padded
    xs = x.reshape(e * c, m)
    row_expert = np.repeat(np.arange(e), c).astype(np.int32)
    gs = jnp.full((e,), c, dtype=jnp.int32)
    y_rag = model.apply(params, jnp.asarray(xs), gs, jnp.asarray(row_expert),
                        method=ExpertMLP.ragged)
    np.testing.assert_allclose(np.asarray(y_rag), want.reshape(e * c, m),
                               rtol=1e-4, atol=1e-5)


def _moe_oracle(x, params, e, L, skips, top_k=1):
    """Mask-based MoE oracle (torch_moe_layer_nobatch.py:73-172 analog)."""
    wg = np.asarray(params["params"]["wg"]["kernel"])
    logits = x @ wg
    gates = np.exp(logits - logits.max(1, keepdims=True))
    gates = gates / gates.sum(1, keepdims=True)
    top1 = gates.argmax(1)
    out = np.zeros_like(x)
    p = params["params"]["experts"]
    for eid in range(e):
        mask = top1 == eid
        if not mask.any():
            continue
        h = x[mask]
        xin = h
        for l in range(L):
            w = np.asarray(p[f"w{l}"][eid])
            b = np.asarray(p[f"b{l}"][eid])[0]
            h = h @ w + b
            if l in skips:
                h = h + xin
                if l < L - 1:
                    h = np.maximum(h, 0)
                xin = h
            elif l < L - 1:
                h = np.maximum(h, 0)
        out[mask] = h * gates[mask, eid:eid + 1]
    return out


def test_moe_nodrop_matches_mask_oracle():
    s, m, e, L = 64, 16, 4, 3
    rng = np.random.RandomState(1)
    x = rng.randn(s, m).astype(np.float32)
    model = MoELayer(model_dim=m, num_experts=e, layer_num=L, skips=[1],
                     top_k=1, train_dispatch="nodrop", eval_dispatch="nodrop")
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y, l_aux, extras = model.apply(params, jnp.asarray(x), deterministic=True)
    want = _moe_oracle(x, params, e, L, {1})
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-3, atol=1e-4)
    assert float(l_aux) > 0


def test_moe_padded_no_overflow_matches_nodrop():
    s, m, e, L = 64, 16, 4, 2
    rng = np.random.RandomState(2)
    x = rng.randn(s, m).astype(np.float32)
    mk = lambda td: MoELayer(model_dim=m, num_experts=e, layer_num=L, skips=None,
                             top_k=1, capacity_factor=float(e),  # cap = S: no drops
                             train_dispatch=td, eval_dispatch=td)
    m1, m2 = mk("padded"), mk("nodrop")
    params = m1.init(jax.random.PRNGKey(3), jnp.asarray(x))
    y1, l1, _ = m1.apply(params, jnp.asarray(x))
    y2, l2, _ = m2.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


MINI_CFG = {
    "layer_num_main": 3,
    "sigma_tag": 0,
    "dir_tag": 1,
    "color_tag": 2,
    "expert_num": 4,
    "layers": {
        "xyz": {"in_ch": 27, "h_ch": 0, "out_ch": 32, "num": 1,
                "type": "mlp", "act": "none"},
        "0": {"in_ch": 32, "h_ch": 32, "out_ch": 32, "num": 3, "skips": [1],
              "init_factor": 1.0, "type": "moe", "act": "relu",
              "gate_type": "top", "k": 1, "fp32_gate": True, "gate_dim": 32},
        "1": {"in_ch": 32, "h_ch": 0, "out_ch": 32, "num": 1,
              "type": "mlp", "act": "none"},
        "2": {"in_ch": 32 + 15 + 8, "h_ch": 0, "out_ch": 16, "num": 1,
              "type": "mlp", "act": "relu"},
        "sigma": {"in_ch": 32, "h_ch": 0, "out_ch": 1, "num": 1,
                  "type": "mlp", "act": "none"},
        "color": {"in_ch": 16, "h_ch": 0, "out_ch": 3, "num": 1,
                  "type": "mlp", "act": "none"},
        "moe_external_gate": {"in_ch": 32, "h_ch": 32, "out_ch": 32, "num": 2,
                              "type": "mlp", "act": "none"},
        "gate_input_norm": {"in_ch": 32, "h_ch": 0, "out_ch": 0, "num": 1,
                            "type": "layernorm"},
    },
}


def test_nerf_moe_graph_forward():
    s = 32
    rng = np.random.RandomState(3)
    x = np.concatenate([
        rng.randn(s, 3).astype(np.float32),                     # xyz
        rng.randn(s, 3).astype(np.float32),                     # viewdir
        rng.randint(0, 5, (s, 1)).astype(np.float32),           # img idx
    ], axis=1)
    model = NeRFMoE(layer_cfg=MINI_CFG, pos_xyz_dim=4, pos_dir_dim=2,
                    appearance_dim=8, appearance_count=5,
                    use_moe_external_gate=True, use_gate_input_norm=True,
                    batch_prioritized_routing=True, moe_capacity_factor=1.0)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = model.apply(params, jnp.asarray(x), deterministic=False)
    assert out["outputs"].shape == (s, 4)
    assert np.isfinite(np.asarray(out["outputs"])).all()
    assert out["extras"]["moe_loss"].shape == (1,)
    rgb = np.asarray(out["outputs"][:, :3])
    assert (rgb >= 0).all() and (rgb <= 1).all()
    sig = np.asarray(out["outputs"][:, 3])
    assert (sig >= 0).all()


def test_nerf_moe_sigma_noise_changes_sigma_only():
    s = 16
    rng = np.random.RandomState(4)
    x = np.concatenate([rng.randn(s, 3), rng.randn(s, 3),
                        np.zeros((s, 1))], 1).astype(np.float32)
    model = NeRFMoE(layer_cfg=MINI_CFG, pos_xyz_dim=4, pos_dir_dim=2,
                    appearance_dim=8, appearance_count=5,
                    use_moe_external_gate=True, use_gate_input_norm=True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out0 = model.apply(params, jnp.asarray(x))
    noise = jnp.full((s, 1), 0.5)
    out1 = model.apply(params, jnp.asarray(x), sigma_noise=noise)
    np.testing.assert_allclose(np.asarray(out0["outputs"][:, :3]),
                               np.asarray(out1["outputs"][:, :3]), rtol=1e-5)
    assert (np.asarray(out1["outputs"][:, 3]) >
            np.asarray(out0["outputs"][:, 3]) - 1e-6).all()


def test_dense_nerf_forward():
    s = 16
    rng = np.random.RandomState(5)
    x = np.concatenate([rng.randn(s, 3), rng.randn(s, 3),
                        np.zeros((s, 1))], 1).astype(np.float32)
    model = NeRF(pos_xyz_dim=4, pos_dir_dim=2, layers=3, skip_layers=(1,),
                 layer_dim=32, appearance_dim=8, appearance_count=4)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = model.apply(params, jnp.asarray(x))
    assert out.shape == (s, 4)
    rgb = np.asarray(out[:, :3])
    assert (rgb >= 0).all() and (rgb <= 1).all()


def test_moe_gradients_nonzero_all_experts():
    """Every expert that receives tokens gets nonzero grads (training path)."""
    s, m, e = 64, 16, 4
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(s, m).astype(np.float32))
    model = MoELayer(model_dim=m, num_experts=e, layer_num=2, top_k=1,
                     capacity_factor=1.25, batch_prioritized_routing=True)
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        y, l_aux, _ = model.apply(p, x, deterministic=False)
        return jnp.sum(y ** 2) + 0.01 * l_aux

    g = jax.grad(loss)(params)
    gw = np.asarray(g["params"]["experts"]["w0"])
    per_expert = np.abs(gw).sum(axis=(1, 2))
    assert (per_expert > 0).sum() >= 2  # balanced-ish random routing
    assert np.abs(np.asarray(g["params"]["wg"]["kernel"])).sum() > 0


AUX_CFG = {
    # exercises the rarely-used graph layer types the reference builds at
    # nerf_moe.py:301-309: groupnorm + dropout main layers
    "layer_num_main": 5,
    "sigma_tag": 0,
    "dir_tag": 3,
    "color_tag": 4,
    "expert_num": 4,
    "layers": {
        "xyz": {"in_ch": 27, "h_ch": 0, "out_ch": 32, "num": 1,
                "type": "mlp", "act": "none"},
        "0": {"in_ch": 32, "h_ch": 32, "out_ch": 32, "num": 2,
              "type": "moe", "act": "relu", "k": 1, "fp32_gate": True,
              "gate_dim": 32},
        "1": {"in_ch": 32, "out_ch": 32, "type": "groupnorm", "group_num": 4},
        "2": {"in_ch": 32, "out_ch": 32, "type": "dropout", "prob": 0.5},
        "3": {"in_ch": 32, "h_ch": 0, "out_ch": 32, "num": 1,
              "type": "mlp", "act": "none"},
        "4": {"in_ch": 32 + 15 + 8, "h_ch": 0, "out_ch": 16, "num": 1,
              "type": "mlp", "act": "relu"},
        "sigma": {"in_ch": 32, "h_ch": 0, "out_ch": 1, "num": 1,
                  "type": "mlp", "act": "none"},
        "color": {"in_ch": 16, "h_ch": 0, "out_ch": 3, "num": 1,
                  "type": "mlp", "act": "none"},
        "moe_external_gate": {"in_ch": 32, "h_ch": 32, "out_ch": 32, "num": 2,
                              "type": "mlp", "act": "none"},
        "gate_input_norm": {"in_ch": 32, "h_ch": 0, "out_ch": 0, "num": 1,
                            "type": "layernorm"},
    },
}


def test_nerf_moe_groupnorm_dropout_layers():
    s = 32
    rng = np.random.RandomState(11)
    x = np.concatenate([rng.randn(s, 3), rng.randn(s, 3),
                        np.zeros((s, 1))], 1).astype(np.float32)
    model = NeRFMoE(layer_cfg=AUX_CFG, pos_xyz_dim=4, pos_dir_dim=2,
                    appearance_dim=8, appearance_count=5,
                    use_moe_external_gate=True, use_gate_input_norm=True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    assert "layer_1" in params["params"]          # groupnorm scale/bias
    # eval: dropout inert -> deterministic
    o1 = model.apply(params, jnp.asarray(x))
    o2 = model.apply(params, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(o1["outputs"]),
                                  np.asarray(o2["outputs"]))
    assert np.isfinite(np.asarray(o1["outputs"])).all()
    # train: dropout active -> rgb depends on the dropout rng (sigma taps
    # the trunk before the dropout layer, so only rgb should change)
    def run(seed):
        return model.apply(
            params, jnp.asarray(x), deterministic=False,
            rngs={"gate_noise": jax.random.PRNGKey(9),
                  "dropout": jax.random.PRNGKey(seed)})["outputs"]
    a, b = np.asarray(run(1)), np.asarray(run(2))
    assert not np.array_equal(a[:, :3], b[:, :3])
    np.testing.assert_array_equal(a[:, 3], b[:, 3])


def test_nerf_moe_batchnorm_layer_raises():
    import copy
    import pytest
    cfg = copy.deepcopy(AUX_CFG)
    cfg["layers"]["1"] = {"in_ch": 32, "out_ch": 32, "type": "batchnorm"}
    model = NeRFMoE(layer_cfg=cfg, pos_xyz_dim=4, pos_dir_dim=2,
                    appearance_dim=8, appearance_count=5,
                    use_moe_external_gate=True, use_gate_input_norm=True)
    x = jnp.zeros((4, 7), jnp.float32)
    with pytest.raises(NotImplementedError, match="batchnorm"):
        model.init(jax.random.PRNGKey(0), x)


def test_groupnorm_matches_torch():
    """flax GroupNorm (num_groups, eps=1e-5) == torch nn.GroupNorm — the
    graph-level 'groupnorm' layer type (reference nerf_moe.py:305-307)."""
    import torch
    from flax import linen as nn

    n, c, groups = 16, 32, 4
    rng = np.random.default_rng(3)
    x = rng.normal(0, 2, (n, c)).astype(np.float32)
    gamma = rng.normal(1, 0.2, (c,)).astype(np.float32)
    beta = rng.normal(0, 0.2, (c,)).astype(np.float32)

    t = torch.nn.GroupNorm(groups, c)
    with torch.no_grad():
        t.weight.copy_(torch.tensor(gamma))
        t.bias.copy_(torch.tensor(beta))
    ref = t(torch.tensor(x)).detach().numpy()

    mod = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    params = {"params": {"scale": jnp.asarray(gamma),
                         "bias": jnp.asarray(beta)}}
    out = np.asarray(mod.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
