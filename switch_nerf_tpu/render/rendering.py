"""Classic (Mega-NeRF-style) ray rendering: coarse/fine hierarchical sampling
with foreground/background (inverted-sphere) composition.

Parity target: switch_nerf/rendering.py:15-494.
  * fg/bg split by unit-sphere intersection (:34-77) — realised with a
    static-shape mask over ALL rays instead of data-dependent gathering
    (rays_with_bg boolean indexing); the DDP keep-alive dummy-backward hack
    (:163-194) is unnecessary since there is no DDP bucket lockstep in JAX.
  * coarse raw pass + fine pass that MERGES coarse samples before
    compositing (:419-433) — i.e. rgb_fine integrates coarse+fine samples.
  * model chunking (:320, 354): Python chunk loop -> lax.scan over fixed
    chunks with jax.checkpoint (rematerialisation), preserving the
    reference's per-chunk MoE routing/capacity semantics.

The `model_fn` contract:
    model_fn(points [P, D], sigma_noise [P,1]|None, rng, train) ->
        (outputs [P, 4], moe_loss [L] fp32)   # L == 0 for dense models
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from switch_nerf_tpu.ops.volume import (
    expand_and_perturb_z_vals, intersect_sphere, depth2pts_outside, sample_pdf,
    volume_render,
)

ModelFn = Callable[..., Tuple[jnp.ndarray, jnp.ndarray]]

# Chunk-scan unroll factor. Unrolling 2x lets XLA schedule/pipeline across chunk
# iterations at 2x program size. Measured on v5e (Building bg-on b1024,
# r5): unroll=2 12,153/12,113 rays/s vs unroll=1 11,977/11,931 (+1.6%,
# reproducible); unroll=4 11,855 (program too big — regresses). Default 2;
# env knob for re-measurement. Read once at import (trace-time constant;
# jit caches key on avals, not env).
_SCAN_UNROLL = int(os.environ.get("SWITCH_NERF_SCAN_UNROLL", "2"))
# experiment knob: lax.scan(_split_transpose=True) splits the scan
# backward into a forward-replay scan + a reversed backward scan instead
# of one fused replay+bwd loop. A/B'd on v5e (Building bg-on b1024):
# dead even across repeated pairs (11,942/11,926 vs 11,829/11,956
# baseline) — default stays off; env knob kept for future re-measurement.


def _scan_split_transpose() -> bool:
    return os.environ.get("SWITCH_NERF_SCAN_SPLIT_TRANSPOSE", "0") == "1"


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    coarse_samples: int = 256
    fine_samples: int = 512
    perturb: float = 1.0
    model_chunk_size: int = 131072
    pos_dir_dim: int = 4
    use_cascade: bool = False
    white_bkgd: bool = False
    use_random_background_color: bool = False
    use_sigma_noise: bool = False
    sigma_noise_std: float = 1.0
    use_mip: bool = False
    bg_model_chunk_size: Optional[int] = None  # dense bg pass chunk size
    # (defaults to model_chunk_size; the dense bg MLP has no routing
    # sorts, so larger chunks amortize scan overhead without the MoE
    # capacity-semantics constraint)
    sh_deg: Optional[int] = None               # spherical-harmonics color
    rgb_padding: Optional[float] = None        # mip only
    weights_resample_padding: float = 0.01     # mip only
    stop_level_grad: bool = True               # mip only
    return_gates: bool = False
    return_pts: bool = False                   # per-sample xyz (coarse)
    return_pts_rgb: bool = False               # per-sample rgb (coarse)
    return_pts_alpha: bool = False             # per-sample alpha (coarse)
    return_sigma: bool = False                 # raw sigma (coarse)
    return_alpha: bool = False
    remat_chunks: bool = True
    # save the PE/IPE encodings across the remat boundary. Measured on
    # v5e: +2.7% on Building (freq-PE, width-256: 11,586 -> 11,894 rays/s)
    # but -0.9% on Mission Bay (IPE, width-512: 5,014 -> 4,971) — the wider
    # mip encodings cost more HBM than their recompute. None (default)
    # resolves to `not use_mip` at the point of use, so EVERY construction
    # site gets the measured policy. SWITCH_NERF_REMAT_SAVE still
    # overrides either way for A/B runs.
    remat_save_pe: Optional[bool] = None
    # assemble [chunk, D] point blocks inside the scan body instead of
    # materialising the global [N*S, D] concat buffer — measured +1.6%
    # step throughput on v5e (11,438 -> 11,625 rays/s, Building bg-on
    # b1024; reproducible across two A/B runs); bit-exact vs the global
    # concat on every output incl. the chunked-remainder path
    chunk_assembly: bool = True


def run_model_chunked(model_fn: ModelFn, points, cfg: RenderConfig,
                      rng: Optional[jax.Array], train: bool):
    """Apply the model over fixed-size point chunks with lax.scan + remat.

    `points` is either the pre-assembled [P, D] array or a TUPLE of
    [P, d_i] column blocks to be concatenated per chunk INSIDE the scan
    body (chunk_assembly mode: the global [P, D] concat buffer is never
    materialised — each chunk assembles its own [chunk, D] block next to
    the compute that consumes it).

    Returns (outputs [P, C], moe_loss [n_chunks, L]).
    """
    parts = points if isinstance(points, tuple) else (points,)
    p = parts[0].shape[0]
    chunk = min(cfg.model_chunk_size, p)
    n_full = p // chunk
    rem = p - n_full * chunk
    n_chunks = n_full + (1 if rem else 0)

    if rng is None:
        rng = jax.random.PRNGKey(0)
    chunk_rngs = jax.random.split(rng, n_chunks)

    def one_chunk(pts_parts, crng):
        pts = pts_parts[0] if len(pts_parts) == 1 \
            else jnp.concatenate(pts_parts, axis=-1)
        noise_rng, model_rng = jax.random.split(crng)
        sigma_noise = None
        if cfg.use_sigma_noise and cfg.sigma_noise_std > 0.0 and train:
            from jax.ad_checkpoint import checkpoint_name
            # save the [chunk, 1] draw across the remat boundary: the
            # threefry normal is pure recompute in the backward otherwise.
            # Measured r5 (SWITCH_NERF_BENCH_SIGMA_NOISE=1): noise cost
            # -2.3% without the save (12,008 vs 12,290 rays/s), -1.1%
            # with it (12,161)
            sigma_noise = checkpoint_name(
                cfg.sigma_noise_std * jax.random.normal(
                    noise_rng, (pts.shape[0], 1), jnp.float32),
                "sigma_noise")
        return model_fn(pts, sigma_noise, model_rng, train)

    if cfg.remat_chunks:
        # save the MoE routing plan + dispatch buffers across the remat
        # boundary: the backward then reuses them instead of re-running the
        # routing sorts and dispatch gathers (~67 MB/chunk bf16 + few MB
        # int32 — cheap next to the recompute)
        names = {"moe_plan", "moe_dispatched", "sigma_noise"}
        save_pe = (not cfg.use_mip) if cfg.remat_save_pe is None \
            else cfg.remat_save_pe
        if save_pe:
            names.add("pe_out")
        # experiment hook: comma-separated names to add (optionally with a
        # leading '+') or remove with a leading '-', e.g.
        # SWITCH_NERF_REMAT_SAVE=-pe_out / +pe_out for A/B runs
        for n in os.environ.get("SWITCH_NERF_REMAT_SAVE", "").split(","):
            if n.startswith("-"):
                names.discard(n[1:])
            elif n:
                names.add(n.lstrip("+"))
        policy = jax.checkpoint_policies.save_only_these_names(
            *sorted(names))
        one_chunk = jax.checkpoint(one_chunk, policy=policy)

    # full-size chunks go through the scan; a non-dividing remainder runs
    # as ONE exact-size call (the reference's smaller final chunk,
    # _inference rendering.py:320-331) — padding it into the scan would
    # route duplicate tokens, consuming expert capacity under BPR and
    # biasing the load-balance loss
    out_parts, moe_parts = [], []
    if n_full:
        xs = tuple(x[:n_full * chunk].reshape(n_full, chunk, x.shape[1])
                   for x in parts)
        if n_full == 1:
            out, moe_loss = one_chunk(tuple(x[0] for x in xs),
                                      chunk_rngs[0])
            outs, moe_losses = out[None], moe_loss[None]
        else:
            def body(carry, x):
                *pts_parts, crng = x
                return carry, one_chunk(tuple(pts_parts), crng)
            _, (outs, moe_losses) = jax.lax.scan(
                body, None, (*xs, chunk_rngs[:n_full]),
                unroll=_SCAN_UNROLL,
                _split_transpose=_scan_split_transpose())
        out_parts.append(outs.reshape(n_full * chunk, -1))
        moe_parts.append(moe_losses)
    if rem:
        out_r, moe_r = one_chunk(tuple(x[n_full * chunk:] for x in parts),
                                 chunk_rngs[-1])
        out_parts.append(out_r)
        moe_parts.append(moe_r[None])

    outputs = out_parts[0] if len(out_parts) == 1 \
        else jnp.concatenate(out_parts, axis=0)
    moe_losses = moe_parts[0] if len(moe_parts) == 1 \
        else jnp.concatenate(moe_parts, axis=0)
    return outputs, moe_losses


def _sort_merge(z: jnp.ndarray, rgbs: jnp.ndarray, sigmas: jnp.ndarray,
                depth_real: Optional[jnp.ndarray] = None):
    """Sort samples by z along the last axis, carrying rgb/sigma payloads
    through one multi-operand lax.sort (TPU-native; replaces argsort +
    take_along_axis which lower to slow dynamic-gather fusions)."""
    from switch_nerf_tpu.ops.sorting import sort_with_payloads
    ops = (rgbs[..., 0], rgbs[..., 1], rgbs[..., 2], sigmas)
    if depth_real is not None:
        ops = ops + (depth_real,)
    out = sort_with_payloads(z, *ops)
    z_s = out[0]
    rgb_s = jnp.stack(out[1:4], axis=-1)
    sig_s = out[4]
    if depth_real is not None:
        return z_s, rgb_s, sig_s, out[5]
    return z_s, rgb_s, sig_s


def _build_points(xyz: jnp.ndarray, rays_d: jnp.ndarray,
                  image_indices: Optional[jnp.ndarray], pos_dir_dim: int,
                  as_parts: bool = False):
    """[N, S, xd] (+dirs +idx broadcast over samples) -> flat [N*S, D],
    or (as_parts) the tuple of flat column blocks for per-chunk assembly
    inside run_model_chunked's scan body."""
    n, s, xd = xyz.shape
    parts = [xyz.reshape(n * s, xd)]
    if pos_dir_dim > 0:
        dirs = jnp.broadcast_to(rays_d, (n, s, 3)).reshape(n * s, 3)
        parts.append(dirs)
    if image_indices is not None:
        idx = jnp.broadcast_to(image_indices[:, None, None], (n, s, 1))
        parts.append(idx.reshape(n * s, 1))
    if as_parts:
        return tuple(parts)
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _inference(model_fn: ModelFn, xyz: jnp.ndarray, z_vals: jnp.ndarray,
               rays_d: jnp.ndarray, image_indices,
               cfg: RenderConfig, rng, train: bool, flip: bool,
               depth_real: Optional[jnp.ndarray]):
    """Run the model on [N, S] samples, return raw (rgbs, sigmas) + moe_loss.

    When flip (background pass, samples ordered by increasing inverse-depth),
    arrays are reversed so the model sees near->far ordering exactly like the
    reference (rendering.py:302-304).
    """
    if flip:
        xyz = jnp.flip(xyz, axis=-2)
        z_vals = jnp.flip(z_vals, axis=-1)
        if depth_real is not None:
            depth_real = jnp.flip(depth_real, axis=-1)

    n, s, _ = xyz.shape
    pts = _build_points(xyz, rays_d, image_indices, cfg.pos_dir_dim,
                        as_parts=cfg.chunk_assembly)
    out, moe_loss = run_model_chunked(model_fn, pts, cfg, rng, train)
    out = out.reshape(n, s, -1)
    if cfg.sh_deg is not None:
        # model emits SH coefficients; evaluate per view direction and
        # sigmoid (reference rendering.py:344-349)
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
    return rgbs, sigmas, z_vals, depth_real, moe_loss


def _composite(rgbs, sigmas, z_vals, last_delta, cfg: RenderConfig, flip: bool,
               depth_real=None, get_depth=False, get_depth_variance=False,
               bkgd_rng=None, composite_rgb: bool = True):
    background_color = None
    if cfg.use_random_background_color and bkgd_rng is not None:
        background_color = jax.random.uniform(bkgd_rng, (3,), jnp.float32)
    return volume_render(
        rgbs, sigmas, z_vals, last_delta, flip=flip,
        composite_rgb=composite_rgb,
        depth_real=depth_real, get_depth=get_depth,
        get_depth_variance=get_depth_variance, white_bkgd=cfg.white_bkgd,
        background_color=background_color)


def render_rays(model_fn: ModelFn,
                bg_model_fn: Optional[ModelFn],
                rays: jnp.ndarray,
                image_indices: Optional[jnp.ndarray],
                cfg: RenderConfig,
                sphere_center: Optional[jnp.ndarray],
                sphere_radius: Optional[jnp.ndarray],
                rng: Optional[jax.Array],
                train: bool = False,
                get_depth: bool = False,
                get_depth_variance: bool = False,
                get_bg_fg_rgb: bool = False,
                model_fn_fine: Optional[ModelFn] = None,
                bg_model_fn_fine: Optional[ModelFn] = None
                ) -> Dict[str, jnp.ndarray]:
    """rays: [N, 8] = [o, d, near, far]. Returns the reference's results dict
    (rgb_fine / rgb_coarse / depth_* / gate_loss_* / bg_gate_loss_* ...).

    model_fn_fine: separate fine-level model (Cascade pairs,
    switch_nerf/models/cascade.py); defaults to model_fn.
    """
    model_fn_fine = model_fn_fine or model_fn
    bg_model_fn_fine = bg_model_fn_fine or bg_model_fn
    n_rays = rays.shape[0]
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]

    if rng is None:
        rng = jax.random.PRNGKey(0)
    (r_perturb_fg, r_perturb_bg, r_fine_fg, r_fine_bg, r_model_c, r_model_f,
     r_bg_c, r_bg_f, r_bkgd) = jax.random.split(rng, 9)
    # the reference draws a FRESH torch.rand background color per composite
    # call (coarse/fine, fg/bg all independent) — one subkey per site.
    # Deliberate deviation: the draw is train-only here (reference also
    # randomizes eval composites; our eval is deterministic by design).
    rbk_fgc, rbk_fgf, rbk_bgc, rbk_bgf = jax.random.split(r_bkgd, 4)

    perturb = cfg.perturb if train else 0.0
    results: Dict[str, jnp.ndarray] = {}

    has_bg = bg_model_fn is not None
    if has_bg:
        fg_far = intersect_sphere(rays_o, rays_d, sphere_center, sphere_radius)
        fg_far = jnp.maximum(fg_far, near[:, 0])
        bg_mask = far[:, 0] > fg_far                       # [N]
        last_delta = jnp.where(bg_mask, fg_far, 1e10)[:, None]
        far = jnp.minimum(far[:, 0], fg_far)[:, None]
    else:
        bg_mask = None
        last_delta = 1e10 * jnp.ones((n_rays, 1), rays.dtype)

    rays_o3 = rays_o[:, None, :]
    rays_d3 = rays_d[:, None, :]

    # ---------------- background (inverted sphere), masked all-rays --------
    bg = {}
    if has_bg:
        bg = _render_background(
            (bg_model_fn, bg_model_fn_fine), rays_o3, rays_d3,
            image_indices, cfg,
            sphere_center, sphere_radius,
            (r_perturb_bg, r_fine_bg, r_bg_c, r_bg_f, rbk_bgc, rbk_bgf),
            train, get_depth, get_depth_variance)

    # ---------------- foreground coarse ------------------------------------
    z_steps = jnp.linspace(0.0, 1.0, cfg.coarse_samples, dtype=rays.dtype)
    z_vals = near * (1 - z_steps) + far * z_steps
    z_vals = expand_and_perturb_z_vals(z_vals, perturb,
                                       r_perturb_fg if perturb > 0 else None)
    xyz_coarse = rays_o3 + rays_d3 * z_vals[..., None]

    # last_delta adjustment (rendering.py:215-216): for finite last_delta,
    # subtract the max z so the final interval ends at the sphere boundary.
    def _adjust_last_delta(ld, z):
        finite = ld[:, 0] < 1e10
        diff = jnp.where(finite, jnp.max(z, axis=-1), 0.0)
        return ld - diff[:, None]

    rgbs_c, sigmas_c, zv_c, _, moe_loss_c = _inference(
        model_fn, xyz_coarse, z_vals, rays_d3, image_indices,
        cfg, r_model_c, train, flip=False, depth_real=None)
    results["gate_loss_coarse"] = moe_loss_c.reshape(-1)

    # per-sample introspection outputs (reference --return_pts /
    # --return_pts_rgb / --return_pts_alpha / --return_sigma /
    # --return_alpha, rendering.py:392-431)
    if cfg.return_pts:
        results["pts_coarse"] = xyz_coarse
    if cfg.return_pts_rgb:
        results["pts_rgb_coarse"] = rgbs_c
    if cfg.return_sigma:
        results["sigma_coarse"] = sigmas_c
    if cfg.return_pts_alpha or cfg.return_alpha:
        deltas_c = jnp.concatenate(
            [zv_c[..., 1:] - zv_c[..., :-1],
             _adjust_last_delta(last_delta, zv_c)], axis=-1)
        alphas_c = 1.0 - jnp.exp(-deltas_c * sigmas_c)
        if cfg.return_pts_alpha:
            results["pts_alpha_coarse"] = alphas_c
        if cfg.return_alpha:
            results["alpha_coarse"] = alphas_c

    fine_total = cfg.fine_samples
    if fine_total > 0:
        # weights for importance sampling (raw coarse compositing)
        vr_c = _composite(rgbs_c, sigmas_c, zv_c,
                          _adjust_last_delta(last_delta, zv_c), cfg,
                          flip=False, composite_rgb=cfg.use_cascade,
                          bkgd_rng=rbk_fgc if train else None)
        if cfg.use_cascade:
            results["rgb_coarse"] = vr_c.rgb
            if has_bg:
                results["bg_lambda_coarse"] = vr_c.bg_lambda

        z_mid = 0.5 * (zv_c[:, :-1] + zv_c[:, 1:])
        fine_z = sample_pdf(z_mid,
                            jax.lax.stop_gradient(vr_c.weights[:, 1:-1]),
                            fine_total, det=(perturb == 0),
                            rng=r_fine_fg)
        if cfg.use_cascade:
            fine_z = jnp.sort(jnp.concatenate([zv_c, fine_z], -1), axis=-1)

        xyz_fine = rays_o3 + rays_d3 * fine_z[..., None]
        rgbs_f, sigmas_f, zv_f, _, moe_loss_f = _inference(
            model_fn_fine, xyz_fine, fine_z, rays_d3, image_indices,
            cfg, r_model_f, train, flip=False, depth_real=None)
        results["gate_loss_fine"] = moe_loss_f.reshape(-1)

        if not cfg.use_cascade:
            # merge coarse + fine raw samples before compositing
            # (rendering.py:419-433). Multi-operand lax.sort carries the
            # payload channels through the sort network — argsort +
            # take_along_axis gathers are pathologically slow on TPU.
            z_all, rgb_all, sig_all = _sort_merge(
                jnp.concatenate([zv_f, zv_c], axis=-1),
                jnp.concatenate([rgbs_f, rgbs_c], axis=-2),
                jnp.concatenate([sigmas_f, sigmas_c], axis=-1))
        else:
            z_all, rgb_all, sig_all = zv_f, rgbs_f, sigmas_f

        # reference quirk kept for parity: the fine last-delta adjustment
        # subtracts max(FINE z) only (rendering.py:249-250), even though the
        # composite runs on the merged coarse+fine array whose max is the
        # coarse far bound
        vr_f = _composite(rgb_all, sig_all, z_all,
                          _adjust_last_delta(last_delta, fine_z), cfg,
                          flip=False, get_depth=get_depth or has_bg,
                          get_depth_variance=get_depth_variance,
                          bkgd_rng=rbk_fgf if train else None)
        results["rgb_fine"] = vr_f.rgb
        if get_depth:
            results["depth_fine"] = vr_f.depth
        if get_depth_variance:
            results["depth_variance_fine"] = vr_f.depth_variance
        if has_bg:
            results["bg_lambda_fine"] = vr_f.bg_lambda
    else:
        vr_c2 = _composite(rgbs_c, sigmas_c, zv_c,
                           _adjust_last_delta(last_delta, zv_c), cfg,
                           flip=False, get_depth=get_depth,
                           get_depth_variance=get_depth_variance,
                           bkgd_rng=rbk_fgc if train else None)
        results["rgb_coarse"] = vr_c2.rgb
        if get_depth:
            results["depth_coarse"] = vr_c2.depth
        if get_depth_variance:
            results["depth_variance_coarse"] = vr_c2.depth_variance
        if has_bg:
            results["bg_lambda_coarse"] = vr_c2.bg_lambda

    # ---------------- fg/bg composition ------------------------------------
    if has_bg:
        types = ["fine" if fine_total > 0 else "coarse"]
        if cfg.use_cascade and fine_total > 0:
            types.append("coarse")
        m = bg_mask.astype(rays.dtype)[:, None]
        for typ in types:
            bl = results[f"bg_lambda_{typ}"][:, None]
            for key in ("rgb", "depth"):
                rk = f"{key}_{typ}"
                if rk not in results or f"{key}_{typ}" not in bg:
                    continue
                val = results[rk]
                bg_val = bg[rk]
                if val.ndim == 1:
                    mult = (bl[:, 0] * m[:, 0])
                    add = bg_val * mult
                else:
                    add = bg_val * bl * m
                if get_bg_fg_rgb:
                    results[f"fg_{rk}"] = val
                    results[f"bg_{rk}"] = add
                results[rk] = val + add
        for typ in ("fine", "coarse"):
            if f"gate_loss_{typ}" in bg:
                results[f"bg_gate_loss_{typ}"] = bg[f"gate_loss_{typ}"]

    return results


def _render_background(bg_model_fns, rays_o3, rays_d3, image_indices,
                       cfg: RenderConfig, sphere_center, sphere_radius,
                       rngs, train, get_depth, get_depth_variance):
    """Inverted-sphere background pass over ALL rays (masked composition is
    applied by the caller). Mirrors rendering.py:42-77 with half coarse and
    half fine samples, flip ordering."""
    bg_model_fn, bg_model_fn_fine = bg_model_fns
    bg_model_fn_fine = bg_model_fn_fine or bg_model_fn
    if cfg.bg_model_chunk_size:
        cfg = dataclasses.replace(
            cfg, model_chunk_size=cfg.bg_model_chunk_size)
    r_perturb, r_fine, r_model_c, r_model_f, r_bkgd_c, r_bkgd_f = rngs
    n_rays = rays_o3.shape[0]
    perturb = cfg.perturb if train else 0.0
    s_bg = cfg.coarse_samples // 2

    bg_z = jnp.linspace(0.0, 1.0, s_bg, dtype=rays_o3.dtype)
    bg_z = jnp.broadcast_to(bg_z, (n_rays, s_bg))
    bg_z = expand_and_perturb_z_vals(bg_z, perturb,
                                     r_perturb if perturb > 0 else None)
    bg_pts, depth_real = depth2pts_outside(rays_o3, rays_d3, bg_z,
                                           sphere_center, sphere_radius)
    last_delta = 1e10 * jnp.ones((n_rays, 1), rays_o3.dtype)

    results: Dict[str, jnp.ndarray] = {}
    rgbs_c, sigmas_c, zv_c, dr_c, moe_loss_c = _inference(
        bg_model_fn, bg_pts, bg_z, rays_d3, image_indices,
        cfg, r_model_c, train, flip=True, depth_real=depth_real)
    results["gate_loss_coarse"] = moe_loss_c.reshape(-1)

    fine_n = cfg.fine_samples // 2
    if cfg.fine_samples > 0:
        vr_c = _composite(rgbs_c, sigmas_c, zv_c, last_delta, cfg, flip=True,
                          composite_rgb=cfg.use_cascade, depth_real=dr_c,
                          bkgd_rng=r_bkgd_c if train else None)
        if cfg.use_cascade:
            results["rgb_coarse"] = vr_c.rgb

        # zv_c comes back FLIPPED (descending inverse-depth); interval
        # lookup needs ascending bins. The reference feeds the ASCENDING
        # mids of the original bg z paired with the flipped-order weights
        # (its _get_results computes mids on the pre-flip z_vals while
        # weights come from the flipped pass) — reproduce that exactly:
        # flip the descending mids back to ascending, keep weights as-is.
        z_mid = jnp.flip(0.5 * (zv_c[:, :-1] + zv_c[:, 1:]), axis=-1)
        fine_z = sample_pdf(z_mid,
                            jax.lax.stop_gradient(vr_c.weights[:, 1:-1]),
                            fine_n, det=(perturb == 0), rng=r_fine)
        # ascending order needed for depth2pts_outside — _inference flips
        # again for compositing. The cascade merge-sort already yields
        # ascending, so only the non-cascade branch (random sample_pdf
        # draws come back unsorted) needs its own sort.
        if cfg.use_cascade:
            fine_z_asc = jnp.sort(jnp.concatenate([zv_c, fine_z], -1),
                                  axis=-1)
        else:
            fine_z_asc = jnp.sort(fine_z, axis=-1)
        bg_pts_f, depth_real_f = depth2pts_outside(rays_o3, rays_d3, fine_z_asc,
                                                   sphere_center, sphere_radius)
        rgbs_f, sigmas_f, zv_f, dr_f, moe_loss_f = _inference(
            bg_model_fn_fine, bg_pts_f, fine_z_asc, rays_d3, image_indices,
            cfg, r_model_f, train, flip=True, depth_real=depth_real_f)
        results["gate_loss_fine"] = moe_loss_f.reshape(-1)

        if not cfg.use_cascade:
            # merge coarse+fine (descending z ordering -> sort on -z)
            z_neg, rgb_all, sig_all, dr_all = _sort_merge(
                -jnp.concatenate([zv_f, zv_c], axis=-1),
                jnp.concatenate([rgbs_f, rgbs_c], axis=-2),
                jnp.concatenate([sigmas_f, sigmas_c], axis=-1),
                jnp.concatenate([dr_f, dr_c], axis=-1))
            z_all = -z_neg
        else:
            z_all, rgb_all, sig_all, dr_all = zv_f, rgbs_f, sigmas_f, dr_f

        vr_f = _composite(rgb_all, sig_all, z_all, last_delta, cfg, flip=True,
                          depth_real=dr_all, get_depth=get_depth,
                          get_depth_variance=get_depth_variance,
                          bkgd_rng=r_bkgd_f if train else None)
        results["rgb_fine"] = vr_f.rgb
        if get_depth:
            results["depth_fine"] = vr_f.depth
    else:
        vr = _composite(rgbs_c, sigmas_c, zv_c, last_delta, cfg, flip=True,
                        depth_real=dr_c, get_depth=get_depth,
                        bkgd_rng=r_bkgd_c if train else None)
        results["rgb_coarse"] = vr.rgb
        if get_depth:
            results["depth_coarse"] = vr.depth
    return results
