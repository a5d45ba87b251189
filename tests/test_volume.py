import jax
import jax.numpy as jnp
import numpy as np

from switch_nerf_tpu.ops import (
    volume_render, sample_pdf, sample_cdf, expand_and_perturb_z_vals,
    intersect_sphere, depth2pts_outside,
)


def ref_volume(rgbs, sigmas, z_vals, last_delta, flip=False):
    """Literal numpy re-derivation of rendering.py:435-474."""
    if flip:
        deltas = z_vals[:, :-1] - z_vals[:, 1:]
    else:
        deltas = z_vals[:, 1:] - z_vals[:, :-1]
    deltas = np.concatenate([deltas, last_delta], -1)
    alphas = 1 - np.exp(-deltas * sigmas)
    t = np.cumprod(1 - alphas + 1e-8, -1)
    bg_lambda = t[:, -1]
    t = np.concatenate([np.ones_like(t[:, :1]), t[:, :-1]], -1)
    weights = alphas * t
    rgb = (weights[..., None] * rgbs).sum(1)
    depth = (weights * z_vals).sum(1)
    return rgb, depth, weights, bg_lambda


def test_volume_render_matches_reference():
    rng = np.random.RandomState(0)
    n, s = 9, 16
    rgbs = rng.rand(n, s, 3).astype(np.float32)
    sigmas = np.abs(rng.randn(n, s)).astype(np.float32)
    z_vals = np.sort(rng.rand(n, s).astype(np.float32) * 10, axis=1)
    last_delta = 1e10 * np.ones((n, 1), dtype=np.float32)

    res = volume_render(jnp.asarray(rgbs), jnp.asarray(sigmas), jnp.asarray(z_vals),
                        jnp.asarray(last_delta), get_depth=True, get_depth_variance=True)
    rgb, depth, weights, bg_lambda = ref_volume(rgbs, sigmas, z_vals, last_delta)
    np.testing.assert_allclose(np.asarray(res.rgb), rgb, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.depth), depth, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res.weights), weights, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.bg_lambda), bg_lambda, rtol=1e-4, atol=1e-6)


def test_volume_render_flip():
    rng = np.random.RandomState(1)
    n, s = 4, 8
    rgbs = rng.rand(n, s, 3).astype(np.float32)
    sigmas = np.abs(rng.randn(n, s)).astype(np.float32)
    z_vals = np.sort(rng.rand(n, s).astype(np.float32), axis=1)[:, ::-1].copy()  # descending
    last_delta = 1e10 * np.ones((n, 1), dtype=np.float32)
    res = volume_render(jnp.asarray(rgbs), jnp.asarray(sigmas), jnp.asarray(z_vals),
                        jnp.asarray(last_delta), flip=True)
    rgb, _, _, _ = ref_volume(rgbs, sigmas, z_vals, last_delta, flip=True)
    np.testing.assert_allclose(np.asarray(res.rgb), rgb, rtol=1e-4, atol=1e-5)


def test_white_background():
    n, s = 3, 4
    rgbs = np.zeros((n, s, 3), dtype=np.float32)
    sigmas = np.zeros((n, s), dtype=np.float32)  # fully transparent
    z_vals = np.tile(np.linspace(1, 2, s, dtype=np.float32), (n, 1))
    last_delta = np.ones((n, 1), dtype=np.float32)
    res = volume_render(jnp.asarray(rgbs), jnp.asarray(sigmas), jnp.asarray(z_vals),
                        jnp.asarray(last_delta), white_bkgd=True)
    np.testing.assert_allclose(np.asarray(res.rgb), 1.0, atol=1e-5)


def test_sample_pdf_deterministic_concentrates_mass():
    n, b = 2, 8
    bins = jnp.tile(jnp.linspace(0.0, 1.0, b + 1), (n, 1))
    weights = np.zeros((n, b), dtype=np.float32)
    weights[:, 3] = 1.0  # all mass in bin 3 -> [3/8, 4/8]
    out = sample_pdf(bins, jnp.asarray(weights), 16, det=True, rng=None)
    out = np.asarray(out)
    # u=0 maps to the leading bin edge by construction (same as reference
    # formula, rendering.py:606-637); all interior samples land in the bin.
    inside = (out >= 3 / 8 - 1e-4) & (out <= 4 / 8 + 1e-4)
    assert inside[:, 1:-1].all()


def test_sample_cdf_uniform_recovers_linspace():
    n, b = 3, 16
    bins = jnp.tile(jnp.linspace(2.0, 4.0, b + 1), (n, 1))
    cdf = jnp.tile(jnp.linspace(1 / b, 1.0, b), (n, 1))
    out = sample_cdf(bins, cdf, 11, det=True, rng=None)
    np.testing.assert_allclose(np.asarray(out),
                               np.tile(np.linspace(2.0, 4.0, 11), (3, 1)),
                               rtol=1e-4, atol=1e-4)


def test_perturb_z_vals_within_bins():
    n, s = 5, 12
    z = jnp.tile(jnp.linspace(1.0, 3.0, s), (n, 1))
    out = expand_and_perturb_z_vals(z, 1.0, jax.random.PRNGKey(0))
    out = np.asarray(out)
    z_np = np.asarray(z)
    mids = 0.5 * (z_np[:, :-1] + z_np[:, 1:])
    upper = np.concatenate([mids, z_np[:, -1:]], -1)
    lower = np.concatenate([z_np[:, :1], mids], -1)
    assert (out >= lower - 1e-6).all() and (out <= upper + 1e-6).all()


def test_intersect_sphere_center_ray():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t = intersect_sphere(o, d, None, None)
    np.testing.assert_allclose(np.asarray(t), 1.0, rtol=1e-5)


def test_depth2pts_outside_on_unit_sphere():
    o = jnp.array([[[0.1, 0.0, 0.0]]])
    d = jnp.array([[[0.0, 0.0, 1.0]]])
    depth = jnp.array([[1.0, 0.5, 0.25]])
    pts, depth_real = depth2pts_outside(o, d, depth, None, None)
    # xyz part must be unit-norm
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pts[..., :3]), axis=-1),
                               1.0, rtol=1e-5)
    assert np.asarray(depth_real).flatten()[0] < np.asarray(depth_real).flatten()[-1]
