"""Mip-NeRF ray rendering (Block-NeRF / Bungee-NeRF path).

Parity target: switch_nerf/rendering_mip.py:15-425.
  * mip_cast_rays — conical-frustum (mean, diag-cov) per sample interval (:15-25)
  * sorted_piecewise_constant_pdf — blurred-weight resampling (:75-131)
  * rgb_padding (:383-384), z-val midpointing (:386), stop_level_grad (:227-228)
  * sh_deg SH-coefficient color (:299-325)

Deliberate deviations (documented): fine resampling is randomized only in
training (the reference passes hparams.perturb unconditionally, making its
EVAL stochastic when perturb>0 — rendering_mip.py:218); the random
background color likewise draws train-only, with independent keys per
coarse/fine composite. Eval here is deterministic by design.

z_vals carry S+1 interval edges; the model evaluates S frustum means, and
compositing runs over interval midpoints.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from switch_nerf_tpu.ops.volume import expand_and_perturb_z_vals, volume_render
from switch_nerf_tpu.render.rendering import RenderConfig, run_model_chunked

FLOAT_EPS = jnp.finfo(jnp.float32).eps


def mip_cast_rays(origin, direction, radius, t):
    """origin/direction: [N, 3]; radius: [N, 1]; t: [N, S+1] edges.

    Returns (mean [N, S, 3], cov_diag [N, S, 3]).
    """
    t0, t1 = t[..., :-1], t[..., 1:]
    c, d = (t0 + t1) / 2, (t1 - t0) / 2
    t_mean = c + (2 * c * d ** 2) / (3 * c ** 2 + d ** 2)
    t_var = (d ** 2) / 3 - (4 / 15) * ((d ** 4 * (12 * c ** 2 - d ** 2))
                                       / (3 * c ** 2 + d ** 2) ** 2)
    r_var = radius ** 2 * ((c ** 2) / 4 + (5 / 12) * d ** 2
                           - (4 / 15) * (d ** 4) / (3 * c ** 2 + d ** 2))
    mean = origin[..., None, :] + direction[..., None, :] * t_mean[..., None]
    null_outer_diag = 1 - (direction ** 2) / jnp.sum(direction ** 2, -1,
                                                     keepdims=True)
    cov_diag = (t_var[..., None] * (direction ** 2)[..., None, :]
                + r_var[..., None] * null_outer_diag[..., None, :])
    return mean, cov_diag


def sorted_piecewise_constant_pdf(bins, weights, num_samples, randomized,
                                  rng=None):
    """Piecewise-constant PDF sampling from sorted bins (mip-NeRF helper).

    bins: [N, B+1]; weights: [N, B] -> samples [N, num_samples].
    """
    eps = 1e-5
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jnp.maximum(0.0, eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding

    pdf = weights / weight_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate([
        jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])
    ], axis=-1)                                          # [N, B+1]

    if randomized and rng is not None:
        s = 1 / num_samples
        u = jnp.arange(num_samples, dtype=jnp.float32) * s
        u = u + jax.random.uniform(
            rng, list(cdf.shape[:-1]) + [num_samples]) * (s - FLOAT_EPS)
        u = jnp.minimum(u, 1.0 - FLOAT_EPS)
    else:
        u = jnp.linspace(0.0, 1.0 - FLOAT_EPS, num_samples)
        u = jnp.broadcast_to(u, list(cdf.shape[:-1]) + [num_samples])

    mask = u[..., None, :] >= cdf[..., :, None]          # [N, B+1, T]

    def find_interval(x):
        x0 = jnp.max(jnp.where(mask, x[..., None], x[..., :1, None]), axis=-2)
        x1 = jnp.min(jnp.where(~mask, x[..., None], x[..., -1:, None]), axis=-2)
        return x0, x1

    bins_g0, bins_g1 = find_interval(bins)
    cdf_g0, cdf_g1 = find_interval(cdf)

    denom = cdf_g1 - cdf_g0
    t = jnp.clip(jnp.where(denom > 0, (u - cdf_g0) / jnp.where(denom == 0, 1.0, denom), 0.0),
                 0.0, 1.0)
    return bins_g0 + t * (bins_g1 - bins_g0)


def _mip_inference(model_fn, means, cov_diags, z_edges, rays_d, image_indices,
                   cfg: RenderConfig, rng, train, get_depth,
                   get_depth_variance, bkgd_rng=None):
    n, s, _ = means.shape
    parts = [jnp.concatenate([means, cov_diags], -1).reshape(n * s, 6)]
    if cfg.pos_dir_dim > 0:
        parts.append(jnp.broadcast_to(rays_d, (n, s, 3)).reshape(n * s, 3))
    if image_indices is not None:
        idx = jnp.broadcast_to(image_indices[:, None, None], (n, s, 1))
        parts.append(idx.reshape(n * s, 1))
    # chunk_assembly: the final [N*S, D] concat happens per chunk inside
    # the scan body (see run_model_chunked; +1.6% on the classic path)
    pts = tuple(parts) if cfg.chunk_assembly \
        else jnp.concatenate(parts, axis=-1)

    out, moe_loss = run_model_chunked(model_fn, pts, cfg, rng, train)
    out = out.reshape(n, s, -1)
    if cfg.sh_deg is not None:
        # SH-coefficient color head (reference rendering_mip.py:299-325):
        # evaluate the harmonics along the view direction and sigmoid
        from switch_nerf_tpu.ops.encoding import eval_sh
        deg = cfg.sh_deg
        rgb_dim = 3 * (deg + 1) ** 2
        coeffs = out[..., :rgb_dim].reshape(n, s, 3, (deg + 1) ** 2)
        dirs = jnp.broadcast_to(rays_d, (n, s, 3))
        rgbs = jax.nn.sigmoid(eval_sh(deg, coeffs, dirs))
        sigmas = out[..., rgb_dim]
    else:
        rgbs = out[..., :3]
        sigmas = out[..., 3]
    if cfg.rgb_padding is not None:
        rgbs = rgbs * (1 + 2 * cfg.rgb_padding) - cfg.rgb_padding

    z_mid = 0.5 * (z_edges[..., 1:] + z_edges[..., :-1])
    last_delta = 1e10 * jnp.ones((n, 1), z_mid.dtype)
    background_color = None
    if cfg.use_random_background_color and bkgd_rng is not None:
        background_color = jax.random.uniform(bkgd_rng, (3,), jnp.float32)
    vr = volume_render(rgbs, sigmas, z_mid, last_delta, composite_rgb=True,
                       get_depth=get_depth, get_depth_variance=get_depth_variance,
                       white_bkgd=cfg.white_bkgd,
                       background_color=background_color)
    return vr, moe_loss


def render_rays_mip(model_fn,
                    rays: jnp.ndarray,
                    radii: jnp.ndarray,
                    image_indices: Optional[jnp.ndarray],
                    cfg: RenderConfig,
                    rng: Optional[jax.Array],
                    train: bool = False,
                    get_depth: bool = False,
                    get_depth_variance: bool = False) -> Dict[str, jnp.ndarray]:
    """rays: [N, 8]; radii: [N, 1]. Returns rgb_coarse/rgb_fine/gate_loss_*."""
    n_rays = rays.shape[0]
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]

    if rng is None:
        rng = jax.random.PRNGKey(0)
    (r_perturb, r_fine, r_model_c, r_model_f,
     r_bkgd_c, r_bkgd_f) = jax.random.split(rng, 6)
    perturb = cfg.perturb if train else 0.0

    z_steps = jnp.linspace(0.0, 1.0, cfg.coarse_samples, dtype=rays.dtype)
    z_vals = near * (1 - z_steps) + far * z_steps
    z_vals = expand_and_perturb_z_vals(z_vals, perturb,
                                       r_perturb if perturb > 0 else None)

    means, cov_diags = mip_cast_rays(rays_o, rays_d, radii, z_vals)

    results: Dict[str, jnp.ndarray] = {}
    vr_c, moe_loss_c = _mip_inference(
        model_fn, means, cov_diags, z_vals, rays_d[:, None, :], image_indices,
        cfg, r_model_c, train,
        get_depth=(cfg.fine_samples == 0 and get_depth),
        get_depth_variance=(cfg.fine_samples == 0 and get_depth_variance),
        bkgd_rng=r_bkgd_c if train else None)
    results["rgb_coarse"] = vr_c.rgb
    results["gate_loss_coarse"] = moe_loss_c.reshape(-1)
    if cfg.fine_samples == 0:
        if get_depth:
            results["depth_coarse"] = vr_c.depth
        if get_depth_variance:
            results["depth_variance_coarse"] = vr_c.depth_variance
        return results

    # blurred-weight resampling (rendering_mip.py:216-231)
    weights = vr_c.weights
    weights_pad = jnp.concatenate(
        [weights[..., :1], weights, weights[..., -1:]], axis=-1)
    weights_max = jnp.maximum(weights_pad[..., :-1], weights_pad[..., 1:])
    weights_blur = 0.5 * (weights_max[..., :-1] + weights_max[..., 1:])
    weights_prime = weights_blur + cfg.weights_resample_padding

    fine_z = sorted_piecewise_constant_pdf(
        z_vals, weights_prime, cfg.fine_samples, randomized=perturb > 0,
        rng=r_fine)
    if cfg.stop_level_grad:
        fine_z = jax.lax.stop_gradient(fine_z)
    fine_z = jnp.sort(fine_z, axis=-1)

    means_f, cov_diags_f = mip_cast_rays(rays_o, rays_d, radii, fine_z)
    vr_f, moe_loss_f = _mip_inference(
        model_fn, means_f, cov_diags_f, fine_z, rays_d[:, None, :],
        image_indices, cfg, r_model_f, train,
        get_depth=get_depth, get_depth_variance=get_depth_variance,
        bkgd_rng=r_bkgd_f if train else None)
    results["rgb_fine"] = vr_f.rgb
    results["gate_loss_fine"] = moe_loss_f.reshape(-1)
    if get_depth:
        results["depth_fine"] = vr_f.depth
    if get_depth_variance:
        results["depth_variance_fine"] = vr_f.depth_variance
    return results
