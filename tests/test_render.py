import jax
import jax.numpy as jnp
import numpy as np

from switch_nerf_tpu.render import RenderConfig, render_rays, render_rays_mip, run_model_chunked


def const_model(rgb=(1.0, 0.5, 0.25), sigma=50.0):
    """Opaque constant-color field."""
    def fn(pts, sigma_noise, rng, train):
        p = pts.shape[0]
        out = jnp.concatenate([
            jnp.tile(jnp.asarray(rgb, jnp.float32), (p, 1)),
            jnp.full((p, 1), sigma, jnp.float32),
        ], axis=-1)
        if sigma_noise is not None:
            out = out.at[:, 3:].add(sigma_noise)
        return out, jnp.zeros((0,), jnp.float32)
    return fn


def make_rays(n, near=0.5, far=2.0):
    rng = np.random.RandomState(0)
    o = rng.randn(n, 3).astype(np.float32) * 0.05
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    nf = np.tile(np.array([[near, far]], dtype=np.float32), (n, 1))
    return jnp.asarray(np.concatenate([o, d, nf], -1))


def test_render_opaque_field_gives_constant_rgb():
    rays = make_rays(8)
    cfg = RenderConfig(coarse_samples=32, fine_samples=32, model_chunk_size=128,
                       pos_dir_dim=2)
    res = render_rays(const_model(), None, rays, None, cfg, None, None,
                      jax.random.PRNGKey(0), train=False, get_depth=True)
    rgb = np.asarray(res["rgb_fine"])
    np.testing.assert_allclose(rgb, np.tile([[1.0, 0.5, 0.25]], (8, 1)),
                               rtol=1e-3, atol=1e-3)
    # opaque field: depth ~ near
    assert (np.asarray(res["depth_fine"]) < 0.7).all()


def test_render_transparent_with_bg():
    rays = make_rays(8, near=0.02, far=20.0)
    cfg = RenderConfig(coarse_samples=32, fine_samples=16, model_chunk_size=512,
                       pos_dir_dim=2)
    fg = const_model(sigma=0.0)                 # fully transparent fg
    bg = const_model(rgb=(0.2, 0.4, 0.6), sigma=50.0)
    res = render_rays(fg, bg, rays, None, cfg, None, None,
                      jax.random.PRNGKey(1), train=False)
    rgb = np.asarray(res["rgb_fine"])
    # transparent fg -> bg color shows through
    np.testing.assert_allclose(rgb, np.tile([[0.2, 0.4, 0.6]], (8, 1)),
                               rtol=5e-2, atol=5e-2)


def test_render_opaque_fg_hides_bg():
    rays = make_rays(8, near=0.02, far=20.0)
    cfg = RenderConfig(coarse_samples=32, fine_samples=16, model_chunk_size=512,
                       pos_dir_dim=2)
    fg = const_model(rgb=(1.0, 0.0, 0.0), sigma=500.0)
    bg = const_model(rgb=(0.0, 1.0, 0.0), sigma=500.0)
    res = render_rays(fg, bg, rays, None, cfg, None, None,
                      jax.random.PRNGKey(1), train=False)
    rgb = np.asarray(res["rgb_fine"])
    np.testing.assert_allclose(rgb, np.tile([[1.0, 0.0, 0.0]], (8, 1)),
                               rtol=1e-2, atol=1e-2)


def test_moe_loss_collected_across_chunks():
    def moe_model(pts, sigma_noise, rng, train):
        p = pts.shape[0]
        out = jnp.concatenate([jnp.full((p, 3), 0.5), jnp.ones((p, 1))], -1)
        return out, jnp.array([0.25, 0.5], jnp.float32)  # 2 moe layers
    rays = make_rays(4)
    cfg = RenderConfig(coarse_samples=16, fine_samples=8, model_chunk_size=16,
                       pos_dir_dim=2)
    res = render_rays(moe_model, None, rays, None, cfg, None, None,
                      jax.random.PRNGKey(0), train=True)
    gl = np.asarray(res["gate_loss_coarse"])
    assert gl.shape == (4 * 16 // 16 * 2,)   # n_chunks * n_moe
    np.testing.assert_allclose(gl.reshape(-1, 2).mean(0), [0.25, 0.5], rtol=1e-6)


def test_run_model_chunked_pads_and_unpads():
    def echo(pts, sigma_noise, rng, train):
        return pts[:, :4] * 2.0, jnp.zeros((0,), jnp.float32)
    pts = jnp.asarray(np.random.RandomState(2).randn(37, 6).astype(np.float32))
    cfg = RenderConfig(model_chunk_size=16)
    out, _ = run_model_chunked(echo, pts, cfg, None, False)
    assert out.shape == (37, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts[:, :4]) * 2,
                               rtol=1e-6)


def test_render_gradients_flow():
    rays = make_rays(4)
    cfg = RenderConfig(coarse_samples=8, fine_samples=8, model_chunk_size=64,
                       pos_dir_dim=2)

    def loss(scale):
        def fn(pts, sigma_noise, rng, train):
            p = pts.shape[0]
            out = jnp.concatenate([jnp.full((p, 3), 0.5) * scale,
                                   jnp.ones((p, 1)) * scale], -1)
            return out, jnp.zeros((0,), jnp.float32)
        res = render_rays(fn, None, rays, None, cfg, None, None,
                          jax.random.PRNGKey(0), train=True)
        return jnp.sum(res["rgb_fine"] ** 2)

    g = jax.grad(loss)(jnp.float32(1.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_render_mip_shapes():
    rays = make_rays(6, near=0.1, far=4.0)
    radii = jnp.full((6, 1), 0.01)
    cfg = RenderConfig(coarse_samples=17, fine_samples=17, model_chunk_size=256,
                       pos_dir_dim=2, use_mip=True, rgb_padding=0.001)

    def mip_model(pts, sigma_noise, rng, train):
        p = pts.shape[0]
        assert pts.shape[1] == 6 + 3  # mean+cov, dirs
        out = jnp.concatenate([jnp.full((p, 3), 0.7), jnp.full((p, 1), 20.0)], -1)
        return out, jnp.zeros((0,), jnp.float32)

    res = render_rays_mip(mip_model, rays, radii, None, cfg,
                          jax.random.PRNGKey(0), train=False)
    assert res["rgb_coarse"].shape == (6, 3)
    assert res["rgb_fine"].shape == (6, 3)
    rgb = np.asarray(res["rgb_fine"])
    assert np.isfinite(rgb).all()
    np.testing.assert_allclose(rgb, 0.7, atol=0.05)


def test_mip_cast_rays_matches_reference_formula():
    from switch_nerf_tpu.render import mip_cast_rays
    rng = np.random.RandomState(3)
    o = rng.randn(5, 3).astype(np.float32)
    d = rng.randn(5, 3).astype(np.float32)
    r = np.abs(rng.randn(5, 1)).astype(np.float32) * 0.01
    t = np.sort(rng.rand(5, 9).astype(np.float32) * 3 + 0.5, axis=1)
    mean, cov = mip_cast_rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(r),
                              jnp.asarray(t))
    t0, t1 = t[..., :-1], t[..., 1:]
    c, dd = (t0 + t1) / 2, (t1 - t0) / 2
    t_mean = c + (2 * c * dd ** 2) / (3 * c ** 2 + dd ** 2)
    want_mean = o[:, None, :] + d[:, None, :] * t_mean[..., None]
    np.testing.assert_allclose(np.asarray(mean), want_mean, rtol=1e-4, atol=1e-5)
    assert (np.asarray(cov) >= -1e-6).all()


def test_run_model_chunked_remainder_runs_exact_size():
    """A non-dividing model_chunk_size must process the remainder at its
    exact size (reference's smaller final chunk) — NOT pad with duplicate
    tokens, which would consume MoE capacity and bias the gate loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from switch_nerf_tpu.render.rendering import (RenderConfig,
                                                  run_model_chunked)

    seen_sizes = []

    def model_fn(pts, sigma_noise, rng, train):
        seen_sizes.append(pts.shape[0])
        out = jnp.concatenate(
            [pts[:, :3] * 2.0, jnp.sum(pts, axis=1, keepdims=True)], -1)
        return out, jnp.zeros((0,), jnp.float32)

    pts = jnp.asarray(np.random.default_rng(0).normal(0, 1, (100, 7)),
                      jnp.float32)
    cfg_small = RenderConfig(model_chunk_size=32, remat_chunks=False)
    cfg_one = RenderConfig(model_chunk_size=128, remat_chunks=False)
    out_small, ml_small = run_model_chunked(model_fn, pts, cfg_small,
                                            None, False)
    out_one, _ = run_model_chunked(model_fn, pts, cfg_one, None, False)
    assert out_small.shape == (100, 4)
    np.testing.assert_allclose(np.asarray(out_small), np.asarray(out_one),
                               rtol=1e-6, atol=1e-6)
    # trace saw a full-size chunk and the exact 100-3*32=4-row remainder
    assert 32 in seen_sizes and 4 in seen_sizes, seen_sizes
    assert ml_small.shape[0] == 4        # 3 full + 1 remainder chunk rows


def test_remat_save_names_invariant(monkeypatch):
    """Gradients through run_model_chunked are bit-identical whether the
    remat policy saves only the MoE names (default) or also the PE sines
    (SWITCH_NERF_REMAT_SAVE=pe_out) — the save-list is a memory/time knob,
    never a numerics one. Also pins remat on == remat off."""
    from switch_nerf_tpu.ops.encoding import freq_encode

    pts = jnp.asarray(np.random.RandomState(5).randn(64, 3).astype(np.float32))

    def loss(w, cfg):
        def fn(p, sigma_noise, rng, train):
            enc = freq_encode(p, 4)                  # tagged "pe_out"
            out = jnp.tanh(enc @ w)
            return out, jnp.zeros((0,), jnp.float32)
        out, _ = run_model_chunked(fn, pts, cfg, jax.random.PRNGKey(0), True)
        return jnp.sum(out ** 2)

    w = jnp.asarray(np.random.RandomState(6).randn(27, 4).astype(np.float32))
    grads = {}
    for name, env, remat in [("default", "", True),     # saves pe_out
                             ("no_pe", "-pe_out", True),
                             ("no_remat", "", False)]:
        monkeypatch.setenv("SWITCH_NERF_REMAT_SAVE", env)
        cfg = RenderConfig(model_chunk_size=16, remat_chunks=remat)
        grads[name] = np.asarray(jax.grad(loss)(w, cfg))
    np.testing.assert_array_equal(grads["default"], grads["no_pe"])
    np.testing.assert_allclose(grads["default"], grads["no_remat"],
                               rtol=1e-6, atol=1e-7)

    # the split-transpose scan-backward knob is a scheduling experiment,
    # never a numerics one: gradients stay bit-identical with it on
    monkeypatch.delenv("SWITCH_NERF_REMAT_SAVE", raising=False)
    monkeypatch.setenv("SWITCH_NERF_SCAN_SPLIT_TRANSPOSE", "1")
    cfg = RenderConfig(model_chunk_size=16, remat_chunks=True)
    g_split = np.asarray(jax.grad(loss)(w, cfg))
    np.testing.assert_allclose(g_split, grads["default"],
                               rtol=1e-6, atol=1e-7)
