"""Volume-rendering math: alpha compositing, stratified/PDF sampling, and the
foreground/background (inverted-sphere) geometry helpers.

Behavioral parity targets (reference file:line):
  * volume_render            — switch_nerf/rendering.py:435-494 (_inference tail)
  * expand_and_perturb_z_vals — rendering.py:573-584
  * sample_pdf / sample_cdf  — rendering.py:587-637
  * intersect_sphere         — rendering.py:497-518
  * depth2pts_outside        — rendering.py:521-570 (Rodrigues rotation)

All functions are pure jnp over [N_rays, N_samples] arrays with static
shapes; cumprod/cumsum lower to log-depth scans on TPU.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "VolumeResults", "volume_render", "expand_and_perturb_z_vals",
    "sample_pdf", "sample_cdf", "intersect_sphere", "depth2pts_outside",
]


class VolumeResults(NamedTuple):
    rgb: Optional[jnp.ndarray]        # [N, 3] composited (None unless composite_rgb)
    depth: Optional[jnp.ndarray]      # [N]
    depth_variance: Optional[jnp.ndarray]  # [N]
    weights: jnp.ndarray              # [N, S]
    alphas: jnp.ndarray               # [N, S]
    transmittance: jnp.ndarray        # [N, S] T_i (shifted, leading 1)
    bg_lambda: jnp.ndarray            # [N] last unshifted T


def volume_render(rgbs: jnp.ndarray,
                  sigmas: jnp.ndarray,
                  z_vals: jnp.ndarray,
                  last_delta: jnp.ndarray,
                  *,
                  flip: bool = False,
                  composite_rgb: bool = True,
                  depth_real: Optional[jnp.ndarray] = None,
                  get_depth: bool = False,
                  get_depth_variance: bool = False,
                  white_bkgd: bool = False,
                  background_color: Optional[jnp.ndarray] = None) -> VolumeResults:
    """Classic NeRF compositing.

    rgbs: [N, S, 3]; sigmas: [N, S]; z_vals: [N, S]; last_delta: [N, 1].
    flip=True means samples are ordered far->near (background pass), so
    deltas are z[i] - z[i+1].
    """
    if flip:
        deltas = z_vals[..., :-1] - z_vals[..., 1:]
    else:
        deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate([deltas, last_delta], axis=-1)        # [N, S]

    alphas = 1.0 - jnp.exp(-deltas * sigmas)                       # [N, S]

    t_full = jnp.cumprod(1.0 - alphas + 1e-8, axis=-1)             # [N, S]
    bg_lambda = t_full[..., -1]
    t_shift = jnp.concatenate([jnp.ones_like(t_full[..., :1]), t_full[..., :-1]],
                              axis=-1)
    weights = alphas * t_shift                                     # [N, S]

    rgb = None
    if composite_rgb:
        rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)          # [N, 3]
        if white_bkgd:
            acc = jnp.sum(weights, axis=-1)
            rgb = rgb + (1.0 - acc[..., None])
        elif background_color is not None:
            acc = jnp.sum(weights, axis=-1)
            rgb = rgb + (1.0 - acc[..., None]) * background_color

    depth = None
    depth_variance = None
    if get_depth or get_depth_variance:
        dr = depth_real if depth_real is not None else z_vals
        w = jax.lax.stop_gradient(weights)
        dr = jax.lax.stop_gradient(dr)
        depth_map = jnp.sum(w * dr, axis=-1)
        if get_depth:
            depth = depth_map
        if get_depth_variance:
            zv = jax.lax.stop_gradient(z_vals)
            depth_variance = jnp.sum(w * jnp.square(zv - depth_map[..., None]), axis=-1)

    return VolumeResults(rgb=rgb, depth=depth, depth_variance=depth_variance,
                         weights=weights, alphas=alphas, transmittance=t_shift,
                         bg_lambda=bg_lambda)


def expand_and_perturb_z_vals(z_vals: jnp.ndarray, perturb: float,
                              rng: Optional[jax.Array]) -> jnp.ndarray:
    """Stratified jitter of sample depths. z_vals: [N, S] (already expanded)."""
    if perturb <= 0 or rng is None:
        return z_vals
    mids = 0.5 * (z_vals[..., :-1] + z_vals[..., 1:])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    u = perturb * jax.random.uniform(rng, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * u


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, fine_samples: int,
               det: bool, rng: Optional[jax.Array]) -> jnp.ndarray:
    """Inverse-CDF sampling of fine z-vals. bins: [N, B+1], weights: [N, B]."""
    weights = weights + 1e-8
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    return sample_cdf(bins, cdf, fine_samples, det, rng)


def sample_cdf(bins: jnp.ndarray, cdf: jnp.ndarray, fine_samples: int,
               det: bool, rng: Optional[jax.Array]) -> jnp.ndarray:
    n_rays, n_bins = cdf.shape
    # explicit zeros shape: zeros_like(cdf[..., :1]) collapses when B == 0
    # (degenerate background passes with coarse_samples // 2 == 2)
    cdf = jnp.concatenate([jnp.zeros((n_rays, 1), cdf.dtype), cdf],
                          axis=-1)                                # [N, B+1]

    if det or rng is None:
        u = jnp.linspace(0.0, 1.0, fine_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (n_rays, fine_samples))
    else:
        u = jax.random.uniform(rng, (n_rays, fine_samples), dtype=cdf.dtype)

    cdf_below, cdf_above, bins_below, bins_above = interval_lookup(
        cdf, bins, u)
    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-8, 1.0, denom)
    return bins_below + (u - cdf_below) / denom * (bins_above - bins_below)


def interval_lookup(cdf: jnp.ndarray, bins: jnp.ndarray, u: jnp.ndarray):
    """For each query u, the bracketing (cdf, bin) pairs — sort-based.

    Equivalent to inds = searchsorted(cdf, u, side='right');
    below = inds-1 (>=0 since cdf[...,0]==0 <= u); above = min(inds, B);
    returning cdf[below], cdf[above], bins[below], bins[above].

    TPU-native: searchsorted + 4x take_along_axis lower to dynamic-gather
    fusions that dominate the whole training step on small rows (profiled at
    ~45 ms/step on the Building config). Instead: one multi-operand
    lax.sort merges the sorted cdf events with the queries, running
    cummax / reversed-cummin carry the bracketing values to each query, and
    a second sort routes results back to query order. cdf and bins are both
    non-decreasing along the row, which makes cummax/cummin exact carries.

    cdf: [N, B+1] non-decreasing, cdf[...,0] == 0; bins: [N, B+1]
    non-decreasing; u: [N, F] in [0, 1).
    """
    n, b1 = cdf.shape
    f = u.shape[-1]
    neg = jnp.finfo(cdf.dtype).min
    pos = jnp.finfo(cdf.dtype).max

    keys = jnp.concatenate([cdf, u], axis=-1)                    # [N, B1+F]
    tag = jnp.concatenate([jnp.zeros((n, b1), jnp.int32),
                           jnp.ones((n, f), jnp.int32)], axis=-1)
    cdf_pay = jnp.concatenate([cdf, jnp.zeros((n, f), cdf.dtype)], -1)
    bin_pay = jnp.concatenate([bins, jnp.zeros((n, f), bins.dtype)], -1)
    qpos = jnp.concatenate([jnp.zeros((n, b1), jnp.int32),
                            jnp.arange(f, dtype=jnp.int32)[None].repeat(n, 0)],
                           axis=-1)

    k_s, tag_s, cdf_s, bin_s, pos_s = jax.lax.sort(
        (keys, tag, cdf_pay, bin_pay, qpos), dimension=-1, num_keys=2,
        is_stable=True)

    is_cdf = tag_s == 0
    # carry the latest cdf/bin value forward (both are non-decreasing)
    below_cdf = jax.lax.cummax(jnp.where(is_cdf, cdf_s, neg), axis=1)
    below_bin = jax.lax.cummax(jnp.where(is_cdf, bin_s, neg), axis=1)
    # next cdf/bin value backward; +inf tail -> clamp to the row's last entry
    above_cdf = jax.lax.cummin(jnp.where(is_cdf, cdf_s, pos), axis=1,
                               reverse=True)
    above_bin = jax.lax.cummin(jnp.where(is_cdf, bin_s, pos), axis=1,
                               reverse=True)
    above_cdf = jnp.where(above_cdf == pos, cdf[:, -1:], above_cdf)
    above_bin = jnp.where(above_bin == pos, bins[:, -1:], above_bin)

    # route back: sort by (tag, original query position); queries land in
    # the last F slots in original order
    _, _, bc, ac, bb, ab = jax.lax.sort(
        (tag_s, pos_s, below_cdf, above_cdf, below_bin, above_bin),
        dimension=-1, num_keys=2, is_stable=True)
    return bc[:, b1:], ac[:, b1:], bb[:, b1:], ab[:, b1:]


def intersect_sphere(rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                     sphere_center: Optional[jnp.ndarray],
                     sphere_radius: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Depth of the intersection of each ray with the unit sphere.

    Unlike the reference (which raises if a camera leaves the unit sphere,
    rendering.py:513-515), we clamp p_norm_sq into [0, 1) — under jit there
    is no data-dependent raise; the trainer does a finite-check psum instead.
    """
    if sphere_radius is not None:
        rays_o = (rays_o - sphere_center) / sphere_radius
        rays_d = rays_d / sphere_radius
    d1 = -jnp.sum(rays_d * rays_o, axis=-1) / jnp.sum(rays_d * rays_d, axis=-1)
    p = rays_o + d1[..., None] * rays_d
    ray_d_cos = 1.0 / jnp.linalg.norm(rays_d, axis=-1)
    p_norm_sq = jnp.clip(jnp.sum(p * p, axis=-1), 0.0, 1.0 - 1e-6)
    d2 = jnp.sqrt(1.0 - p_norm_sq) * ray_d_cos
    return d1 + d2


def depth2pts_outside(rays_o: jnp.ndarray, rays_d: jnp.ndarray, depth: jnp.ndarray,
                      sphere_center: Optional[jnp.ndarray],
                      sphere_radius: Optional[jnp.ndarray]
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inverted-sphere background points (NeRF++ parameterization).

    rays_o/rays_d: [N, 1, 3]; depth: [N, S] in (0, 1] (inverse distance).
    Returns pts [N, S, 4] = (unit-sphere xyz after Rodrigues rotation, depth)
    and depth_real [N, S].
    """
    if sphere_radius is not None:
        rays_o = (rays_o - sphere_center) / sphere_radius
        rays_d = rays_d / sphere_radius

    d1 = -jnp.sum(rays_d * rays_o, axis=-1) / jnp.sum(rays_d * rays_d, axis=-1)  # [N, 1]
    p_mid = rays_o + d1[..., None] * rays_d
    p_mid_norm = jnp.linalg.norm(p_mid, axis=-1)                                  # [N, 1]
    ray_d_norm = jnp.linalg.norm(rays_d, axis=-1)
    ray_d_cos = 1.0 / ray_d_norm
    d2 = jnp.sqrt(jnp.clip(1.0 - p_mid_norm * p_mid_norm, 0.0, None)) * ray_d_cos
    p_sphere = rays_o + (d1 + d2)[..., None] * rays_d                             # [N, 1, 3]

    rot_axis = jnp.cross(rays_o, p_sphere)
    rot_axis = rot_axis / (jnp.linalg.norm(rot_axis, axis=-1, keepdims=True) + 1e-8)
    phi = jnp.arcsin(jnp.clip(p_mid_norm, -1.0, 1.0))                             # [N, 1]
    theta = jnp.arcsin(jnp.clip(p_mid_norm * depth, -1.0, 1.0))                   # [N, S]
    rot_angle = (phi - theta)[..., None]                                          # [N, S, 1]

    cos_a = jnp.cos(rot_angle)
    sin_a = jnp.sin(rot_angle)
    p_sphere_new = (p_sphere * cos_a
                    + jnp.cross(jnp.broadcast_to(rot_axis, rot_angle.shape[:-1] + (3,)),
                                jnp.broadcast_to(p_sphere, rot_angle.shape[:-1] + (3,))) * sin_a
                    + rot_axis * jnp.sum(rot_axis * p_sphere, axis=-1, keepdims=True)
                    * (1.0 - cos_a))
    p_sphere_new = p_sphere_new / jnp.linalg.norm(p_sphere_new, axis=-1, keepdims=True)

    depth_real = 1.0 / (depth + 1e-8) * jnp.cos(theta) + d1
    pts = jnp.concatenate([p_sphere_new, depth[..., None]], axis=-1)
    return pts, depth_real
