"""LPIPS-JAX backbone shape/flow tests with synthetic weights.

Numerical parity against the lpips package needs its pretrained weights
(offline here); these tests pin the architecture plumbing: tap counts,
channel widths, scalar output, and identical-image => 0 distance.
"""
import numpy as np
import pytest

from switch_nerf_tpu import lpips_jax as L


def _rand_weights(rng, net):
    w = {}
    if net == "vgg":
        cin = 3
        taps, ci = [], 0
        for cfg in L._VGG16:
            if cfg == "M":
                continue
            w[f"conv{ci}/kernel"] = rng.normal(
                0, 0.05, (3, 3, cin, cfg)).astype(np.float32)
            w[f"conv{ci}/bias"] = np.zeros(cfg, np.float32)
            if ci in L._VGG_TAPS:
                taps.append(cfg)
            cin = cfg
            ci += 1
    elif net == "alex":
        cin = 3
        taps, ci = [], 0
        for cfg in L._ALEX:
            if cfg == "M":
                continue
            c, k, s, p = cfg
            w[f"conv{ci}/kernel"] = rng.normal(
                0, 0.05, (k, k, cin, c)).astype(np.float32)
            w[f"conv{ci}/bias"] = np.zeros(c, np.float32)
            taps.append(c)
            cin = c
            ci += 1
    else:  # squeeze
        w["conv0/kernel"] = rng.normal(0, 0.05, (3, 3, 3, 64)).astype(
            np.float32)
        w["conv0/bias"] = np.zeros(64, np.float32)
        taps = [64]
        cin = 64
        ci = 1
        level = 1
        for fi, (sq, e1, e3) in enumerate(L._SQUEEZE_FIRES):
            w[f"conv{ci}/kernel"] = rng.normal(
                0, 0.05, (1, 1, cin, sq)).astype(np.float32)
            w[f"conv{ci}/bias"] = np.zeros(sq, np.float32)
            w[f"conv{ci+1}/kernel"] = rng.normal(
                0, 0.05, (1, 1, sq, e1)).astype(np.float32)
            w[f"conv{ci+1}/bias"] = np.zeros(e1, np.float32)
            w[f"conv{ci+2}/kernel"] = rng.normal(
                0, 0.05, (3, 3, sq, e3)).astype(np.float32)
            w[f"conv{ci+2}/bias"] = np.zeros(e3, np.float32)
            cin = e1 + e3
            ci += 3
            if level in L._SQUEEZE_TAPS:
                taps.append(cin)
            level += 1
    for li, c in enumerate(taps):
        w[f"lin{li}/kernel"] = np.abs(rng.normal(
            0, 0.05, (1, 1, c, 1))).astype(np.float32)
    return w


@pytest.mark.parametrize("net", ["vgg", "alex", "squeeze"])
def test_lpips_backbone(net):
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    w = {k: jnp.asarray(v) for k, v in _rand_weights(rng, net).items()}
    img0 = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    img1 = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    d = float(L.lpips_distance(jnp.asarray(img0), jnp.asarray(img1), net, w))
    assert np.isfinite(d) and d > 0
    d_same = float(L.lpips_distance(jnp.asarray(img0), jnp.asarray(img0),
                                    net, w))
    assert d_same == pytest.approx(0.0, abs=1e-6)
    assert d > d_same


def test_lpips_all_from_npz(tmp_path):
    rng = np.random.default_rng(1)
    out = {}
    for net in ("vgg", "alex"):
        for k, v in _rand_weights(rng, net).items():
            out[f"{net}/{k}"] = v
    path = tmp_path / "w.npz"
    np.savez(path, **out)

    img0 = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    img1 = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    res = L.lpips_all(img0, img1, str(path))
    assert np.isfinite(res["vgg"]) and np.isfinite(res["alex"])
    assert res["squeeze"] is None  # net absent from the file


@pytest.mark.parametrize("net", ["vgg", "alex", "squeeze"])
def test_substitute_weights_deterministic(net):
    w1 = L.substitute_weights(net)
    L.substitute_weights.cache_clear()
    w2 = L.substitute_weights(net)
    assert set(w1) == set(w2)
    for k in w1:
        np.testing.assert_array_equal(w1[k], w2[k])
    # lin layers are the uniform 'baseline' calibration
    lin0 = w1["lin0/kernel"]
    assert np.allclose(lin0, 1.0 / lin0.shape[2])


def test_metrics_lpips_substitute_fallback(monkeypatch):
    """Without a weights file, metrics.lpips emits all three numbers via
    the documented substitute; SWITCH_NERF_LPIPS_SUBSTITUTE=0 restores the
    strict None behaviour (VERDICT round-1 item 4)."""
    from switch_nerf_tpu import metrics as M
    monkeypatch.delenv("SWITCH_NERF_LPIPS_WEIGHTS", raising=False)
    monkeypatch.setattr(M, "_LPIPS_DEFAULT_PATH", "/nonexistent/lpips.npz")
    rng = np.random.default_rng(2)
    # [0, 1] images: metrics.lpips follows the reference's
    # normalize=True contract and scales to [-1, 1] internally
    img0 = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
    img1 = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)

    res = M.lpips(img0, img1)
    assert set(res) == {"vgg", "alex", "squeeze"}
    for v in res.values():
        assert v is not None and np.isfinite(v) and v > 0
    same = M.lpips(img0, img0)
    for v in same.values():
        assert v == pytest.approx(0.0, abs=1e-6)

    monkeypatch.setenv("SWITCH_NERF_LPIPS_SUBSTITUTE", "0")
    strict = M.lpips(img0, img1)
    assert all(v is None for v in strict.values())
