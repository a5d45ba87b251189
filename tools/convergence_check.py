"""Convergence sanity: overfit a tiny synthetic lambertian-sphere scene.

Run on a real accelerator (TPU/GPU): trains a 4-expert MoE NeRF for 2500
steps against an analytic red-sphere-on-white scene and asserts PSNR > 21 dB
— an end-to-end guard on the training math (transmittance, routing, losses)
that unit tests cannot give. ~1 min warm / ~6 min cold on one v5e chip.

    python tools/convergence_check.py
"""
import sys, time
import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from switch_nerf_tpu.config import get_opts_base, parse_args
from switch_nerf_tpu.models.model_utils import get_nerf
from switch_nerf_tpu.trainer import (SceneInfo, create_train_state, make_train_step,
                                     make_eval_step, render_config_from_hparams)

# ---- synthetic scene: red unit-ish sphere at origin on white bg -----------
def render_gt(rays_o, rays_d):
    # analytic sphere radius .5 at origin, lambertian red, white background
    b = 2*np.sum(rays_o*rays_d, -1); c = np.sum(rays_o**2, -1) - 0.25
    disc = b*b - 4*c
    hit = disc > 0
    t = (-b - np.sqrt(np.maximum(disc, 0)))/2
    n = rays_o + t[:, None]*rays_d
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    light = np.maximum(n @ np.array([0.577, 0.577, 0.577]), 0.1)
    rgb = np.where(hit[:, None], np.stack([light, light*0.2, light*0.2], -1),
                   np.ones((rays_o.shape[0], 3)))
    return rgb.astype(np.float32)

def make_cam_rays(theta, W=64, H=64, f=80.0):
    i, j = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i+0.5-W/2)/f, -(j+0.5-H/2)/f, -np.ones_like(i)], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    # camera on a circle radius 2 looking at origin
    cpos = np.array([2*np.sin(theta), 0.3, 2*np.cos(theta)], np.float32)
    fwd = -cpos/np.linalg.norm(cpos)
    right = np.cross(np.array([0,1,0], np.float32), fwd); right/=np.linalg.norm(right)
    up = np.cross(fwd, right)
    R = np.stack([right, up, -fwd], -1)   # camera->world (z backward)
    d = dirs.reshape(-1,3) @ R.T
    o = np.broadcast_to(cpos, d.shape).copy()
    return o.astype(np.float32), d.astype(np.float32)

os_, ds_, rgbs_ = [], [], []
for th in np.linspace(0, 2*np.pi, 20, endpoint=False):
    o, d = make_cam_rays(th)
    os_.append(o); ds_.append(d); rgbs_.append(render_gt(o, d))
rays_o = np.concatenate(os_); rays_d = np.concatenate(ds_); gts = np.concatenate(rgbs_)
near = np.full((rays_o.shape[0],1), 0.5, np.float32)
far = np.full((rays_o.shape[0],1), 4.0, np.float32)
rays = np.concatenate([rays_o, rays_d, near, far], -1)

h = parse_args(get_opts_base(), [])
h.use_moe = True; h.use_moe_external_gate = True; h.use_gate_input_norm = True
h.moe_expert_num = 4; h.moe_train_batch = True; h.moe_test_batch = True
h.moe_capacity_factor = 1.0; h.batch_prioritized_routing = True
h.moe_l_aux_wt = 5e-4
h.bg_nerf = False; h.appearance_dim = 0
h.pos_xyz_dim = 6; h.pos_dir_dim = 2
h.coarse_samples, h.fine_samples = 32, 32
h.model_chunk_size = 16384; h.batch_size = 2048
h.train_iterations = 2500; h.lr = 5e-4; h.amp = True
W = 64
xyz_in = 3 + 6*3*2
h.model = {"layer_num_main": 3, "sigma_tag": 0, "dir_tag": 1, "color_tag": 2,
  "expert_num": 4, "layers": {
  "xyz": {"in_ch": xyz_in, "h_ch": 0, "out_ch": W, "num": 1, "type": "mlp", "act": "none"},
  "0": {"in_ch": W, "h_ch": W, "out_ch": W, "num": 4, "skips": [2], "type": "moe",
        "act": "relu", "gate_type": "top", "k": 1, "fp32_gate": True, "gate_dim": W},
  "1": {"in_ch": W, "h_ch": 0, "out_ch": W, "num": 1, "type": "mlp", "act": "none"},
  "2": {"in_ch": W + (3+2*3*2), "h_ch": 0, "out_ch": 32, "num": 1, "type": "mlp", "act": "relu"},
  "sigma": {"in_ch": W, "h_ch": 0, "out_ch": 1, "num": 1, "type": "mlp", "act": "none"},
  "color": {"in_ch": 32, "h_ch": 0, "out_ch": 3, "num": 1, "type": "mlp", "act": "none"},
  "moe_external_gate": {"in_ch": W, "h_ch": W, "out_ch": W, "num": 2, "type": "mlp", "act": "none"},
  "gate_input_norm": {"in_ch": W, "h_ch": 0, "out_ch": 0, "num": 1, "type": "layernorm"}}}

model = get_nerf(h, appearance_count=1)
state = create_train_state(jax.random.PRNGKey(0), h, model, None, {})
cfg = render_config_from_hparams(h)
step = jax.jit(make_train_step(model, None, h, cfg, SceneInfo()), donate_argnums=0)

rng = np.random.default_rng(0)
t0 = time.time()
for it in range(1, h.train_iterations+1):
    idx = rng.integers(0, rays.shape[0], h.batch_size)
    batch = {"rays": jnp.asarray(rays[idx]), "rgbs": jnp.asarray(gts[idx])}
    state, m = step(state, batch)
    if it % 500 == 0:
        print(f"iter {it}: psnr={float(m['psnr']):.2f} loss={float(m['loss']):.5f} gate={float(m.get('gate_loss', 0)):.3f}", flush=True)
print(f"train time {time.time()-t0:.0f}s", flush=True)
assert float(m["psnr"]) > 21, f"did not converge: psnr={float(m['psnr'])}"
print("CONVERGENCE OK", flush=True)
