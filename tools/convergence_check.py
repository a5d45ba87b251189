"""Convergence evidence on synthetic analytic scenes (real accelerator).

Two modes:

  python tools/convergence_check.py          # quick: lambertian sphere,
      4 experts, 2.5k steps, asserts PSNR > 21 dB (~1 min warm on v5e)

  python tools/convergence_check.py --hard   # the round-2 evidence run
      (VERDICT r1 item 7): textured multi-sphere scene with a
      direction-dependent background, 8 experts, appearance embeddings,
      background NeRF ON, 10k steps. Asserts PSNR, per-expert routing
      entropy and balance, and writes tools/convergence_hard_result.json
      (checked in).

End-to-end guard on the training math (transmittance, fg/bg composition,
routing, appearance conditioning, losses) that unit tests cannot give.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from switch_nerf_tpu.config import get_opts_base, parse_args
from switch_nerf_tpu.models.model_utils import get_bg_nerf, get_nerf
from switch_nerf_tpu.trainer import (SceneInfo, create_train_state,
                                     make_train_step,
                                     render_config_from_hparams)


# --------------------------------------------------------------- cameras ---
def make_cam_rays(theta, W=64, H=64, f=80.0, radius=2.0, y=0.3):
    i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i + 0.5 - W / 2) / f, -(j + 0.5 - H / 2) / f,
                     -np.ones_like(i)], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    cpos = np.array([radius * np.sin(theta), y, radius * np.cos(theta)],
                    np.float32)
    fwd = -cpos / np.linalg.norm(cpos)
    right = np.cross(np.array([0, 1, 0], np.float32), fwd)
    right /= np.linalg.norm(right)
    up = np.cross(fwd, right)
    R = np.stack([right, up, -fwd], -1)
    d = dirs.reshape(-1, 3) @ R.T
    o = np.broadcast_to(cpos, d.shape).copy()
    return o.astype(np.float32), d.astype(np.float32)


# ----------------------------------------------------------- quick scene ---
def gt_sphere(rays_o, rays_d):
    """Red lambertian sphere radius .5 at origin on white bg."""
    b = 2 * np.sum(rays_o * rays_d, -1)
    c = np.sum(rays_o ** 2, -1) - 0.25
    disc = b * b - 4 * c
    hit = disc > 0
    t = (-b - np.sqrt(np.maximum(disc, 0))) / 2
    n = rays_o + t[:, None] * rays_d
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    light = np.maximum(n @ np.array([0.577, 0.577, 0.577]), 0.1)
    rgb = np.where(hit[:, None],
                   np.stack([light, light * 0.2, light * 0.2], -1),
                   np.ones((rays_o.shape[0], 3)))
    return rgb.astype(np.float32)


# ------------------------------------------------------------ hard scene ---
_SPHERES = [  # (center xyz, radius, base rgb)
    (np.array([0.9, 0.0, 0.0], np.float32), 0.45, (0.9, 0.2, 0.2)),
    (np.array([-0.9, 0.0, 0.0], np.float32), 0.45, (0.2, 0.9, 0.3)),
    (np.array([0.0, 0.0, 0.9], np.float32), 0.45, (0.2, 0.3, 0.9)),
    (np.array([0.0, 0.0, -0.9], np.float32), 0.45, (0.9, 0.8, 0.2)),
    (np.array([0.0, 0.7, 0.0], np.float32), 0.35, (0.8, 0.3, 0.8)),
]


def gt_textured(rays_o, rays_d, brightness):
    """Nearest-hit over textured spheres; direction-dependent background.

    Textures: checker in object coordinates (high-frequency content the
    MoE must spatially decompose). Background: smooth direction gradient
    + stripes — content only the background NeRF can represent.
    brightness: per-ray scalar (per-camera appearance factor).
    """
    n_rays = rays_o.shape[0]
    best_t = np.full(n_rays, np.inf, np.float32)
    rgb = np.zeros((n_rays, 3), np.float32)
    for center, radius, base in _SPHERES:
        oc = rays_o - center
        b = 2 * np.sum(oc * rays_d, -1)
        c = np.sum(oc ** 2, -1) - radius * radius
        disc = b * b - 4 * c
        hit = disc > 0
        t = (-b - np.sqrt(np.maximum(disc, 0))) / 2
        closer = hit & (t > 0) & (t < best_t)
        p = rays_o + t[:, None] * rays_d - center
        n = p / np.maximum(np.linalg.norm(p, axis=-1, keepdims=True), 1e-9)
        light = np.maximum(n @ np.array([0.577, 0.577, 0.577]), 0.15)
        checker = ((np.floor(p[:, 0] * 8) + np.floor(p[:, 1] * 8)
                    + np.floor(p[:, 2] * 8)) % 2)
        tex = 0.4 + 0.6 * checker
        col = (light * tex)[:, None] * np.asarray(base, np.float32)
        best_t = np.where(closer, t, best_t)
        rgb = np.where(closer[:, None], col, rgb)
    miss = ~np.isfinite(best_t)
    d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    sky = np.stack([0.4 + 0.3 * d[:, 0],
                    0.5 + 0.3 * np.sin(5.0 * d[:, 1]),
                    0.6 + 0.2 * d[:, 2]], -1)
    rgb = np.where(miss[:, None], np.clip(sky, 0, 1), rgb)
    return np.clip(rgb * brightness[:, None], 0.0, 1.0).astype(np.float32)


def moe_graph(width, experts, n_moe, skips, xyz_dim, dir_dim, app_dim):
    xyz_in = 3 + xyz_dim * 3 * 2
    dir_app = 3 + dir_dim * 3 * 2 + app_dim
    return {
        "layer_num_main": 3, "sigma_tag": 0, "dir_tag": 1, "color_tag": 2,
        "expert_num": experts, "layers": {
            "xyz": {"in_ch": xyz_in, "h_ch": 0, "out_ch": width, "num": 1,
                    "type": "mlp", "act": "none"},
            "0": {"in_ch": width, "h_ch": width, "out_ch": width,
                  "num": n_moe, "skips": skips, "type": "moe", "act": "relu",
                  "gate_type": "top", "k": 1, "fp32_gate": True,
                  "gate_dim": width},
            "1": {"in_ch": width, "h_ch": 0, "out_ch": width, "num": 1,
                  "type": "mlp", "act": "none"},
            "2": {"in_ch": width + dir_app, "h_ch": 0, "out_ch": 32,
                  "num": 1, "type": "mlp", "act": "relu"},
            "sigma": {"in_ch": width, "h_ch": 0, "out_ch": 1, "num": 1,
                      "type": "mlp", "act": "none"},
            "color": {"in_ch": 32, "h_ch": 0, "out_ch": 3, "num": 1,
                      "type": "mlp", "act": "none"},
            "moe_external_gate": {"in_ch": width, "h_ch": width,
                                  "out_ch": width, "num": 2, "type": "mlp",
                                  "act": "none"},
            "gate_input_norm": {"in_ch": width, "h_ch": 0, "out_ch": 0,
                                "num": 1, "type": "layernorm"},
        },
    }


def base_hparams():
    h = parse_args(get_opts_base(), [])
    h.use_moe = True
    h.use_moe_external_gate = True
    h.use_gate_input_norm = True
    h.moe_train_batch = True
    h.moe_test_batch = True
    h.moe_capacity_factor = 1.0
    h.batch_prioritized_routing = True
    h.moe_l_aux_wt = 5e-4
    h.amp = True
    return h


def run_quick() -> None:
    os_, ds_, rgbs_ = [], [], []
    for th in np.linspace(0, 2 * np.pi, 20, endpoint=False):
        o, d = make_cam_rays(th)
        os_.append(o)
        ds_.append(d)
        rgbs_.append(gt_sphere(o, d))
    rays_o = np.concatenate(os_)
    rays_d = np.concatenate(ds_)
    gts = np.concatenate(rgbs_)
    rays = np.concatenate(
        [rays_o, rays_d,
         np.full((rays_o.shape[0], 1), 0.5, np.float32),
         np.full((rays_o.shape[0], 1), 4.0, np.float32)], -1)

    h = base_hparams()
    h.moe_expert_num = 4
    h.bg_nerf = False
    h.appearance_dim = 0
    h.pos_xyz_dim = 6
    h.pos_dir_dim = 2
    h.coarse_samples, h.fine_samples = 32, 32
    h.model_chunk_size = 16384
    h.batch_size = 2048
    h.train_iterations = 2500
    h.lr = 5e-4
    h.model = moe_graph(64, 4, 4, [2], 6, 2, 0)

    model = get_nerf(h, appearance_count=1)
    state = create_train_state(jax.random.PRNGKey(0), h, model, None)
    cfg = render_config_from_hparams(h)
    step = jax.jit(make_train_step(model, None, h, cfg, SceneInfo()),
                   donate_argnums=0)

    rng = np.random.default_rng(0)
    t0 = time.time()
    m = None
    for it in range(1, h.train_iterations + 1):
        idx = rng.integers(0, rays.shape[0], h.batch_size)
        batch = {"rays": jnp.asarray(rays[idx]),
                 "rgbs": jnp.asarray(gts[idx])}
        state, m = step(state, batch)
        if it % 500 == 0:
            print(f"iter {it}: psnr={float(m['psnr']):.2f} "
                  f"loss={float(m['loss']):.5f} "
                  f"gate={float(m.get('gate_loss', 0)):.3f}", flush=True)
    print(f"train time {time.time()-t0:.0f}s", flush=True)
    assert float(m["psnr"]) > 21, f"did not converge: {float(m['psnr'])}"
    print("CONVERGENCE OK", flush=True)


def run_hard(iters: int = 10000) -> None:
    n_cams = 40
    os_, ds_, rgbs_, idxs_ = [], [], [], []
    for ci, th in enumerate(np.linspace(0, 2 * np.pi, n_cams,
                                        endpoint=False)):
        o, d = make_cam_rays(th, W=80, H=80, f=90.0, radius=2.2,
                             y=0.3 + 0.4 * np.sin(3 * th))
        bright = np.full(o.shape[0],
                         0.85 + 0.3 * ci / n_cams, np.float32)
        os_.append(o)
        ds_.append(d)
        rgbs_.append(gt_textured(o, d, bright))
        idxs_.append(np.full(o.shape[0], ci, np.float32))
    rays_o = np.concatenate(os_)
    rays_d = np.concatenate(ds_)
    gts = np.concatenate(rgbs_)
    img_idx = np.concatenate(idxs_)
    rays = np.concatenate(
        [rays_o, rays_d,
         np.full((rays_o.shape[0], 1), 0.05, np.float32),
         np.full((rays_o.shape[0], 1), 100.0, np.float32)], -1)

    h = base_hparams()
    h.moe_expert_num = 8
    h.bg_nerf = True
    h.appearance_dim = 8
    h.pos_xyz_dim = 8
    h.pos_dir_dim = 2
    h.coarse_samples, h.fine_samples = 48, 48
    h.model_chunk_size = 16384
    h.batch_size = 4096
    h.train_iterations = iters
    h.lr = 5e-4
    h.bg_layer_dim = 64
    h.model = moe_graph(96, 8, 5, [2], 8, 2, 8)

    model = get_nerf(h, appearance_count=n_cams)
    bg_model = get_bg_nerf(h, n_cams)
    state = create_train_state(jax.random.PRNGKey(0), h, model, bg_model)
    cfg = render_config_from_hparams(h)
    # fg sphere bound must contain the cameras (NeRF++ convention)
    scene = SceneInfo(sphere_center=jnp.zeros((3,)),
                      sphere_radius=jnp.full((3,), 2.8))
    step = jax.jit(make_train_step(model, bg_model, h, cfg, scene),
                   donate_argnums=0)

    rng = np.random.default_rng(0)
    t0 = time.time()
    m = None
    psnr_trace = []
    for it in range(1, h.train_iterations + 1):
        idx = rng.integers(0, rays.shape[0], h.batch_size)
        batch = {"rays": jnp.asarray(rays[idx]),
                 "rgbs": jnp.asarray(gts[idx]),
                 "image_indices": jnp.asarray(img_idx[idx])}
        state, m = step(state, batch)
        if it % 1000 == 0:
            rec = {"iter": it, "psnr": float(m["psnr"]),
                   "loss": float(m["loss"]),
                   "gate_loss": float(m.get("gate_loss", 0.0))}
            psnr_trace.append(rec)
            print(" ".join(f"{k}={v}" for k, v in rec.items()), flush=True)
    train_time = time.time() - t0
    print(f"train time {train_time:.0f}s", flush=True)

    # ---- routing balance: top-1 expert histogram over fg scene points ----
    h.moe_return_gates = True
    gmodel = get_nerf(h, appearance_count=n_cams)
    pts_xyz = rng.uniform(-1.3, 1.3, (8192, 3)).astype(np.float32)
    dirs = rng.normal(size=(8192, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    app = rng.integers(0, n_cams, (8192, 1)).astype(np.float32)
    pts = np.concatenate([pts_xyz, dirs, app], -1)
    out = gmodel.apply({"params": state.params["nerf"]},
                       jnp.asarray(pts), deterministic=True)
    gates = np.asarray(jnp.stack(out["extras"]["moe_gates"], axis=1))
    top1 = gates[:, 0, 0]                                # first MoE layer
    hist = np.bincount(top1.astype(np.int64),
                       minlength=h.moe_expert_num).astype(np.float64)
    frac = hist / hist.sum()
    entropy = float(-(frac[frac > 0] * np.log(frac[frac > 0])).sum())
    max_entropy = float(np.log(h.moe_expert_num))
    print(f"expert fractions: {np.round(frac, 3).tolist()}")
    print(f"routing entropy: {entropy:.3f} / {max_entropy:.3f}")

    psnr = float(m["psnr"])
    gate_loss = float(m.get("gate_loss", 0.0))
    result = {
        "mode": "hard", "iters": h.train_iterations,
        "experts": h.moe_expert_num, "bg_nerf": True,
        "appearance_dim": h.appearance_dim,
        "final_psnr_db": round(psnr, 2),
        "final_gate_loss": round(gate_loss, 4),
        "routing_entropy_nats": round(entropy, 3),
        "max_entropy_nats": round(max_entropy, 3),
        "expert_fractions": [round(f, 4) for f in frac.tolist()],
        "train_time_s": round(train_time, 1),
        "psnr_trace": psnr_trace,
        "device": str(jax.devices()[0]),
        "thresholds": {"psnr_db": 24.0, "entropy_nats": 1.2,
                       "max_expert_fraction": 0.6},
    }
    out_path = pathlib.Path(__file__).parent / "convergence_hard_result.json"
    out_path.write_text(json.dumps(result, indent=1))
    print(f"wrote {out_path}")

    assert psnr > 24.0, f"did not converge: psnr={psnr}"
    assert entropy > 1.2, f"routing collapsed: entropy={entropy}"
    assert frac.max() < 0.6, f"routing collapsed: fractions={frac}"
    print("HARD CONVERGENCE OK", flush=True)


def run_production(iters: int = 10000) -> None:
    """Round-4 verdict item 1: train the EXACT published Building
    architecture end-to-end on the real chip and check it learns.

    Config = the published command (reference README.md:59-82 +
    configs/switch_nerf/building.yaml): width 256, 7-layer 8-expert MoE
    with skip [3], external 2x256 gate + gate-input LayerNorm, fp32 top-1
    gate, capacity 1.0 + BPR, l_aux 5e-4, bg NeRF ON, 256+512 samples,
    bf16 amp, sigma noise std 1.0, per-chip batch 1024 (the reference's
    per-GPU share of batch 8192), the published 500k-iteration LR schedule
    (5e-4, decay 0.1) of which `iters` steps are executed. Scene: the
    textured-multi-sphere + directional-background synthetic scene with
    per-camera brightness (appearance conditioning).

    Writes tools/convergence_production_result.json (checked in): PSNR
    curve, gate-loss trace, routing entropy/fractions, thresholds.
    """
    from __graft_entry__ import _building_hparams

    n_cams = 64
    os_, ds_, rgbs_, idxs_ = [], [], [], []
    for ci, th in enumerate(np.linspace(0, 2 * np.pi, n_cams,
                                        endpoint=False)):
        o, d = make_cam_rays(th, W=96, H=96, f=110.0, radius=2.2,
                             y=0.3 + 0.4 * np.sin(3 * th))
        bright = np.full(o.shape[0],
                         0.85 + 0.3 * ci / n_cams, np.float32)
        os_.append(o)
        ds_.append(d)
        rgbs_.append(gt_textured(o, d, bright))
        idxs_.append(np.full(o.shape[0], ci, np.float32))
    rays_o = np.concatenate(os_)
    rays_d = np.concatenate(ds_)
    gts = np.concatenate(rgbs_)
    img_idx = np.concatenate(idxs_)
    rays = np.concatenate(
        [rays_o, rays_d,
         np.full((rays_o.shape[0], 1), 0.05, np.float32),
         np.full((rays_o.shape[0], 1), 100.0, np.float32)], -1)

    h = _building_hparams(tiny=False)       # the published architecture
    h.coarse_samples, h.fine_samples = 256, 512
    # 8192 = measured v5e optimum under the r5 unroll=2 scan default
    # (bench.py sweep; the checked-in 10k/30k runs predate the sweep and
    # executed at 16384 — ~1% slower, same numerics)
    h.model_chunk_size = 8192
    h.batch_size = 1024                     # per-chip share of 8192
    h.train_iterations = 500000             # published LR schedule horizon
    h.use_sigma_noise = True                # published command flag
    h.sigma_noise_std = 1.0
    assert h.amp and h.moe_expert_num == 8 and h.appearance_dim == 48

    model = get_nerf(h, appearance_count=n_cams)
    bg_model = get_bg_nerf(h, n_cams)
    state = create_train_state(jax.random.PRNGKey(0), h, model, bg_model)
    cfg = render_config_from_hparams(h)
    scene = SceneInfo(sphere_center=jnp.zeros((3,)),
                      sphere_radius=jnp.full((3,), 2.8))
    step = jax.jit(make_train_step(model, bg_model, h, cfg, scene),
                   donate_argnums=0)

    rng = np.random.default_rng(0)
    t0 = time.time()
    m = None
    trace = []
    report_every = min(500, max(iters // 10, 1))
    for it in range(1, iters + 1):
        idx = rng.integers(0, rays.shape[0], h.batch_size)
        batch = {"rays": jnp.asarray(rays[idx]),
                 "rgbs": jnp.asarray(gts[idx]),
                 "image_indices": jnp.asarray(img_idx[idx])}
        state, m = step(state, batch)
        if it % report_every == 0:
            # ONE value fetch closes the async burst (true device sync)
            rec = {"iter": it, "psnr": round(float(m["psnr"]), 3),
                   "loss": round(float(m["loss"]), 5),
                   "gate_loss": round(float(m.get("gate_loss", 0.0)), 4)}
            trace.append(rec)
            print(" ".join(f"{k}={v}" for k, v in rec.items()), flush=True)
    train_time = time.time() - t0
    print(f"train time {train_time:.0f}s "
          f"({iters / train_time:.1f} steps/s, "
          f"{h.batch_size * iters / train_time:.0f} rays/s)", flush=True)

    # routing balance: top-1 expert histogram over fg scene points
    h.moe_return_gates = True
    gmodel = get_nerf(h, appearance_count=n_cams)
    pts_xyz = rng.uniform(-1.3, 1.3, (8192, 3)).astype(np.float32)
    dirs = rng.normal(size=(8192, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    app = rng.integers(0, n_cams, (8192, 1)).astype(np.float32)
    pts = np.concatenate([pts_xyz, dirs, app], -1)
    out = gmodel.apply({"params": state.params["nerf"]},
                       jnp.asarray(pts), deterministic=True)
    gates = np.asarray(jnp.stack(out["extras"]["moe_gates"], axis=1))
    top1 = gates[:, 0, 0]
    hist = np.bincount(top1.astype(np.int64),
                       minlength=h.moe_expert_num).astype(np.float64)
    frac = hist / hist.sum()
    entropy = float(-(frac[frac > 0] * np.log(frac[frac > 0])).sum())
    max_entropy = float(np.log(h.moe_expert_num))
    print(f"expert fractions: {np.round(frac, 3).tolist()}")
    print(f"routing entropy: {entropy:.3f} / {max_entropy:.3f}")

    psnrs = [r["psnr"] for r in trace]
    gate_losses = [r["gate_loss"] for r in trace]
    result = {
        "mode": "production", "iters": iters,
        "architecture": "published Building (width 256, 7-layer 8-expert "
                        "MoE, external gate + LayerNorm, bg NeRF, "
                        "256+512 samples, b1024/chip, bf16 amp, "
                        "sigma noise 1.0, lr 5e-4 decay 0.1/500k)",
        "final_psnr_db": round(psnrs[-1], 2),
        "final_gate_loss": gate_losses[-1],
        "routing_entropy_nats": round(entropy, 3),
        "max_entropy_nats": round(max_entropy, 3),
        "expert_fractions": [round(f, 4) for f in frac.tolist()],
        "train_time_s": round(train_time, 1),
        "steps_per_s": round(iters / train_time, 2),
        "trace": trace,
        "device": str(jax.devices()[0]),
        "thresholds": {"psnr_db": 26.0, "entropy_nats": 1.6,
                       "max_expert_fraction": 0.45,
                       "gate_loss_band": [0.9, 1.6]},
    }
    here = pathlib.Path(__file__).parent

    def _fresh(p: pathlib.Path) -> pathlib.Path:
        """Never clobber an existing (possibly checked-in) record."""
        n, q = 1, p
        while q.exists():
            q = p.with_name(f"{p.stem}_rerun{n}{p.suffix}")
            n += 1
        return q

    out_path = here / "convergence_production_result.json"
    # thresholds are calibrated for >=10k-step runs (the 30k trace still
    # oscillates 25.6-28 dB in the 5-9k band); shorter runs are config
    # smokes: no asserts, and the result never displaces checked-in
    # long-run evidence
    smoke = iters < 10000
    if smoke:
        out_path = here / "convergence_production_smoke.json"
    elif out_path.exists():
        try:
            have = int(json.loads(out_path.read_text()).get("iters", 0))
        except Exception:
            have = 0
        if have > iters:    # keep the longer checked-in run canonical
            out_path = _fresh(
                here / f"convergence_production_result_{iters}iters.json")
        elif have and have < iters:  # preserve the shorter run's record
            out_path.rename(_fresh(
                here / f"convergence_production_result_{have // 1000}k.json"))
    out_path.write_text(json.dumps(result, indent=1))
    print(f"wrote {out_path}")

    if smoke:
        print(f"SMOKE OK (psnr={psnrs[-1]}, thresholds skipped at "
              f"{iters} iters)", flush=True)
        return
    # curve improves monotonically at the trend level
    assert psnrs[-1] > 26.0, f"did not converge: psnr={psnrs[-1]}"
    assert psnrs[-1] > psnrs[0] + 3.0, f"no improvement: {psnrs}"
    # gate loss stable: E*sum(me*ce)/S^2 == 1.0 at perfect balance for
    # top-1; a stable run stays in a band around it, never collapsing
    # toward the one-expert value E
    tail = gate_losses[len(gate_losses) // 2:]
    assert 0.9 < min(tail) and max(tail) < 1.6, f"gate loss unstable: {tail}"
    assert entropy > 1.6, f"routing collapsed: entropy={entropy}"
    assert frac.max() < 0.45, f"routing collapsed: fractions={frac}"
    print("PRODUCTION CONVERGENCE OK", flush=True)


def run_mip(iters: int = 4000) -> None:
    """Mip-path end-to-end learning check: MipNeRFMoE + render_rays_mip
    (the mission_bay-style configuration: use_mip on, bg off, radii in the
    batch). The static parity tests pin the mip math to the reference;
    this verifies the mip TRAINING path actually learns on hardware."""
    os_, ds_, rgbs_ = [], [], []
    for th in np.linspace(0, 2 * np.pi, 20, endpoint=False):
        o, d = make_cam_rays(th)
        os_.append(o)
        ds_.append(d)
        rgbs_.append(gt_sphere(o, d))
    rays_o = np.concatenate(os_)
    rays_d = np.concatenate(ds_)
    gts = np.concatenate(rgbs_)
    rays = np.concatenate(
        [rays_o, rays_d,
         np.full((rays_o.shape[0], 1), 0.5, np.float32),
         np.full((rays_o.shape[0], 1), 4.0, np.float32)], -1)
    # conical-frustum base radius: pixel footprint / focal * 2/sqrt(12)
    radii = np.full((rays_o.shape[0], 1), 1.0 / 60.0 * 2 / np.sqrt(12),
                    np.float32)

    h = base_hparams()
    h.use_mip = True
    h.nerfmoe_class_name = "MipNeRFMoE"
    h.moe_expert_num = 4
    h.bg_nerf = False
    h.appearance_dim = 0
    h.pos_xyz_dim = 6
    h.pos_dir_dim = 2
    h.coarse_samples, h.fine_samples = 32, 32
    h.model_chunk_size = 16384
    h.batch_size = 2048
    h.train_iterations = iters
    h.lr = 5e-4
    h.model = moe_graph(64, 4, 4, [2], 6, 2, 0)

    model = get_nerf(h, appearance_count=1)
    state = create_train_state(jax.random.PRNGKey(0), h, model, None)
    cfg = render_config_from_hparams(h)
    step = jax.jit(make_train_step(model, None, h, cfg, SceneInfo(),
                                   mip=True),
                   donate_argnums=0)

    rng = np.random.default_rng(0)
    t0 = time.time()
    m = None
    for it in range(1, h.train_iterations + 1):
        idx = rng.integers(0, rays.shape[0], h.batch_size)
        batch = {"rays": jnp.asarray(rays[idx]),
                 "rgbs": jnp.asarray(gts[idx]),
                 "radii": jnp.asarray(radii[idx])}
        state, m = step(state, batch)
        if it % 500 == 0:
            print(f"iter {it}: psnr={float(m['psnr']):.2f} "
                  f"loss={float(m['loss']):.5f} "
                  f"gate={float(m.get('gate_loss', 0)):.3f}", flush=True)
    train_time = time.time() - t0
    print(f"train time {train_time:.0f}s", flush=True)
    psnr = float(m["psnr"])
    result = {"mode": "mip", "iters": iters, "final_psnr_db": round(psnr, 2),
              "train_time_s": round(train_time, 1),
              "device": str(jax.devices()[0]),
              "thresholds": {"psnr_db": 21.0}}
    out_path = pathlib.Path(__file__).parent / "convergence_mip_result.json"
    out_path.write_text(json.dumps(result, indent=1))
    print(f"wrote {out_path}")
    assert psnr > 21, f"mip path did not converge: {psnr}"
    print("MIP CONVERGENCE OK", flush=True)


if __name__ == "__main__":
    from bench import _wait_for_backend
    _wait_for_backend()
    iters = None
    for a in sys.argv[1:]:
        if a.startswith("--iters="):
            iters = int(a.split("=")[1])
    if "--hard" in sys.argv:
        run_hard(iters or 10000)
    elif "--mip" in sys.argv:
        run_mip(iters or 4000)
    elif "--production" in sys.argv:
        run_production(iters or 10000)
    else:
        run_quick()
