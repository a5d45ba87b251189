"""Routing-collapse cross-check (round-3 verdict item 8).

Round-3 observed a bit-reproducible MoE gate collapse at ~9.5k steps when
the mip convergence run's LR schedule was stretched 4x
(tools/convergence_check.py --mip --iters=16000: gate loss 1.09 -> 3.09,
incomplete PSNR recovery). Open question: shared training dynamics of the
recipe, or a subtle gate-numerics divergence from the reference?

This tool runs the SAME experiment in both frameworks at a CPU-feasible
scale: identical synthetic scene (the convergence sphere), identical
batch index stream, identical init (torch init -> converted), identical
stretched Adam + per-step ExponentialLR schedule, the mip training loss.
The gate-loss curves are the collapse signature.

  python tools/collapse_cross_check.py --side=jax   --iters=16000
  python tools/collapse_cross_check.py --side=torch --iters=16000

Each writes tools/collapse_{side}_{iters}.json with sampled curves.
Compare: if BOTH collapse (gate loss rising well above its plateau), the
collapse is the recipe's dynamics, not a framework divergence.
"""
import json
import pathlib
import sys
import time
import types

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

WIDTH, EXPERTS, N_MOE = 64, 4, 4
SKIPS = [2]
XYZ_DIM, DIR_DIM = 6, 2
BATCH = 1024
SAMPLES = 16
LR = 5e-4
L_AUX_WT = 5e-4
SAMPLE_EVERY = 50


def _scene():
    from tools.convergence_check import gt_sphere, make_cam_rays
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
    radii = np.full((rays_o.shape[0], 1), 1.0 / 60.0 * 2 / np.sqrt(12),
                    np.float32)
    return rays, gts, radii


def _graph():
    from tools.convergence_check import moe_graph
    g = moe_graph(WIDTH, EXPERTS, N_MOE, SKIPS, XYZ_DIM, DIR_DIM, 0)
    for cfg in g["layers"].values():
        # the reference MipNeRFMoE requires init_factor on moe entries
        # (nerf_moe.py:603); ours defaults it — set explicitly so both
        # sides build from the identical graph dict
        if cfg.get("type") == "moe":
            cfg.setdefault("init_factor", 1.0)
    return g


def _torch_args(expert_type):
    return types.SimpleNamespace(
        sh_deg=None, shifted_softplus=True, pos_xyz_dim=XYZ_DIM,
        pos_dir_dim=DIR_DIM, appearance_dim=0, affine_appearance=False,
        nerfmoe_class_name="MipNeRFMoE", model=_graph(),
        moe_expert_type=expert_type, moe_expert_num=EXPERTS,
        moe_capacity_factor=1.0, batch_prioritized_routing=True,
        gate_noise=-1.0, use_load_importance_loss=False,
        compute_balance_loss=False, dispatcher_no_score=False,
        dispatcher_no_postscore=False, use_moe_external_gate=True,
        use_gate_input_norm=True, moe_use_residual=False,
        moe_return_gates=False, moe_return_gate_logits=False,
        use_moe=True, amp_use_bfloat16=False, bf16=False,
        no_expert_parallel=True, moe_local_expert_num=EXPERTS,
        single_data_group=None, use_fp32_in_moe=False,
        moe_layer_num=1, apply_on_expert_fn_name=None,
        no_feature_mapping_relu=False,
        # render_rays_mip surface
        perturb=0.0, coarse_samples=SAMPLES, fine_samples=SAMPLES,
        model_chunk_size=16384, use_cascade=False, white_bkgd=False,
        use_sigma_noise=False, sigma_noise_std=0.0,
        use_random_background_color=False, return_pts=False,
        return_pts_rgb=False, return_pts_alpha=False, return_sigma=False,
        return_alpha=False, rgb_padding=0.001,
        weights_resample_padding=0.01, stop_level_grad=True,
        container_path=None, train_mega_nerf=None,
        use_balance_loss=True, moe_l_aux_wt=L_AUX_WT,
        parallel_env=types.SimpleNamespace(global_rank=0))


def _torch_init_sd():
    """Deterministic torch init (the shared starting point)."""
    import torch
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                           / "tests"))
    from tests.reference_stubs import install_stubs
    install_stubs()
    from switch_nerf.models.nerf_moe import get_nerf_moe_inner
    torch.manual_seed(2024)
    model = get_nerf_moe_inner(_torch_args("expertmlp"), appearance_count=1,
                               xyz_dim=3)
    return {k: v.clone() for k, v in model.state_dict().items()}


def run_torch(iters: int, label: str = "torch",
              variant: dict | None = None):
    """variant: same bisect knobs as run_jax ('amp', 'perturb', 'batch',
    'samples', 'dispatch') stepping the torch reference toward the
    ORIGINAL collapsing recipe; 'init' must stay 'torch' (both sides
    already share the torch init)."""
    import torch
    from torch.optim import Adam
    from torch.optim.lr_scheduler import ExponentialLR
    sd = _torch_init_sd()
    from switch_nerf.models.model_utils import convert_to_seqexperts
    from switch_nerf.models.nerf_moe import get_nerf_moe_inner
    from switch_nerf.modules.tutel_moe_ext.tutel_moe_layer_nobatch import \
        MOELayer as RefMOELayer
    from switch_nerf.rendering_mip import render_rays as ref_render_mip

    v = {"amp": False, "perturb": 0.0, "batch": BATCH, "samples": SAMPLES,
         "init": "torch", "dispatch": "nodrop", **(variant or {})}
    assert v["init"] == "torch", \
        "torch side always starts from the shared torch init"

    torch.manual_seed(2025)
    if v["dispatch"] == "padded":
        # the reference's batch path (--moe_train_batch: expertmlp experts,
        # apply_on_expert_fn, capacity-1.0 BPR grid with overflow drops) —
        # runs on CPU via the tutel sparse-kernel equivalents in
        # tests/reference_stubs.py
        hp = _torch_args("expertmlp")
        model = get_nerf_moe_inner(hp, appearance_count=1, xyz_dim=3)
        model.load_state_dict(sd)
    else:
        sd_seq = convert_to_seqexperts({k: v2.clone()
                                        for k, v2 in sd.items()})
        sd_seq = {(k[len("module."):] if k.startswith("module.") else k): v2
                  for k, v2 in sd_seq.items()}
        hp = _torch_args("seqexperts")
        model = get_nerf_moe_inner(hp, appearance_count=1, xyz_dim=3)
        model.load_state_dict(sd_seq)
        for mod in model.modules():
            if isinstance(mod, RefMOELayer):
                orig = mod.forward

                def patched(inp, _orig=orig, **kw):
                    kw["apply_on_expert_fn_name"] = \
                        "apply_on_expert_fn_nobatch_torch"
                    return _orig(inp, **kw)
                mod.forward = patched
    hp.perturb = v["perturb"]
    hp.coarse_samples = hp.fine_samples = v["samples"]
    model.train()

    if v["amp"]:
        # the original recipe's bf16 autocast, mapped to CPU: the
        # reference's internal torch.cuda.amp.autocast(enabled=...) guards
        # (fp32 gate, fp32 sigma/color heads) must keep disabling autocast
        # on CPU, so rebind them to cpu-device autocast
        def _cpu_autocast(enabled=True, **kw):
            return torch.amp.autocast("cpu", enabled=enabled,
                                      dtype=torch.bfloat16)
        torch.cuda.amp.autocast = _cpu_autocast

    rays, gts, radii = _scene()
    opt = Adam(model.parameters(), lr=LR)
    sched = ExponentialLR(opt, gamma=0.1 ** (1.0 / iters))
    rng = np.random.default_rng(0)
    trace = {"step": [], "photo": [], "gate": [], "psnr": []}
    t0 = time.time()
    import contextlib
    amp_ctx = ((lambda: torch.amp.autocast("cpu", dtype=torch.bfloat16))
               if v["amp"] else contextlib.nullcontext)
    for it in range(1, iters + 1):
        idx = rng.integers(0, rays.shape[0], v["batch"])
        opt.zero_grad()
        with amp_ctx():
            results, _ = ref_render_mip(
                nerf=model, rays=torch.tensor(rays[idx]),
                radii=torch.tensor(radii[idx]),
                image_indices=None, hparams=hp,
                get_depth=False, get_depth_variance=True)
        tgt = torch.tensor(gts[idx])
        photo_f = torch.nn.functional.mse_loss(
            results["rgb_fine"].float(), tgt)
        photo = (photo_f
                 + torch.nn.functional.mse_loss(
                     results["rgb_coarse"].float(), tgt)) / 2
        gate = (results["gate_loss_fine"].float().mean()
                + results["gate_loss_coarse"].float().mean()) / 2
        loss = photo + L_AUX_WT * gate
        loss.backward()
        opt.step()
        sched.step()
        if it % SAMPLE_EVERY == 0 or it == 1:
            psnr = float(-10.0 * torch.log10(photo_f).item())
            trace["step"].append(it)
            trace["photo"].append(float(photo))
            trace["gate"].append(float(gate))
            trace["psnr"].append(psnr)
            _dump(label, iters, trace, v)
            print(f"[{label} {it}/{iters}] photo={float(photo):.5f} "
                  f"gate={float(gate):.3f} psnr={psnr:.2f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return trace


def run_jax(iters: int, platform: str = "cpu", label: str = "jax",
            variant: dict | None = None):
    """platform='tpu' runs the SAME experiment (same init, same batch
    stream) on the real chip — the backend-numerics A/B against the CPU
    curve: the r3 collapse was observed on TPU (convergence_check --mip
    --iters=16000), so if the TPU side collapses where CPU does not, the
    collapse is numerics-noise-sensitive recipe dynamics, not logic.

    variant: bisect knobs stepping this config toward the ORIGINAL
    collapsing recipe (tools/convergence_check.py run_mip at iters=16000),
    one ingredient at a time: {'amp': bool (bf16 compute),
    'perturb': float (stochastic z sampling), 'batch': int,
    'samples': int, 'init': 'torch'|'flax', 'dispatch':
    'nodrop'|'padded' (padded = capacity-1.0 BPR token drops, the
    original's moe_train_batch=True path)}."""
    import os
    import jax
    v = {"amp": False, "perturb": 0.0, "batch": BATCH, "samples": SAMPLES,
         "init": "torch", "dispatch": "nodrop", **(variant or {})}
    if platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=1")
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import json as _json
    from scripts.convert_torch_ckpt import (convert_nerf_moe_state_dict,
                                            unflatten)
    from switch_nerf_tpu.config import get_opts, parse_args
    from switch_nerf_tpu.models.model_utils import get_nerf
    from switch_nerf_tpu.trainer import (SceneInfo, create_train_state,
                                         make_train_step,
                                         render_config_from_hparams)

    argv = [
        "--exp_name", "collapse", "--dataset_path", "unused",
        "--use_moe", "--use_moe_external_gate", "--use_gate_input_norm",
        "--batch_prioritized_routing", "--moe_expert_num", str(EXPERTS),
        "--no_bg_nerf", "--pos_xyz_dim", str(XYZ_DIM),
        "--pos_dir_dim", str(DIR_DIM), "--appearance_dim", "0",
        "--perturb", str(v["perturb"]),
        "--coarse_samples", str(v["samples"]),
        "--fine_samples", str(v["samples"]),
        "--model_chunk_size", "16384", "--lr", str(LR),
        "--lr_decay_factor", "0.1", "--train_iterations", str(iters),
        "--moe_l_aux_wt", str(L_AUX_WT),
        "--use_mip", "--nerfmoe_class_name", "MipNeRFMoE",
        "--model", _json.dumps(_graph())]
    if not v["amp"]:
        argv.append("--no_amp")
    h = parse_args(get_opts(), argv)
    if v["dispatch"] == "padded":
        h.moe_train_batch = True
        h.moe_test_batch = True
        h.moe_capacity_factor = 1.0
    model = get_nerf(h, appearance_count=1)
    state = create_train_state(jax.random.PRNGKey(0), h, model, None)
    if v["init"] == "torch":
        sd = _torch_init_sd()
        params = {"nerf": jax.tree_util.tree_map(
            jnp.asarray, unflatten(convert_nerf_moe_state_dict(
                {k: v2.numpy() for k, v2 in sd.items()})))}
        state = state.replace(params=params,
                              opt_state=state.tx.init(params))
    step_fn = jax.jit(make_train_step(
        model, None, h, render_config_from_hparams(h), SceneInfo(),
        mip=True), donate_argnums=0)

    rays, gts, radii = _scene()
    rng = np.random.default_rng(0)
    trace = {"step": [], "photo": [], "gate": [], "psnr": []}
    t0 = time.time()
    for it in range(1, iters + 1):
        idx = rng.integers(0, rays.shape[0], v["batch"])
        batch = {"rays": jnp.asarray(rays[idx]),
                 "rgbs": jnp.asarray(gts[idx]),
                 "radii": jnp.asarray(radii[idx])}
        state, m = step_fn(state, batch)
        if it % SAMPLE_EVERY == 0 or it == 1:
            trace["step"].append(it)
            trace["photo"].append(float(m["photo_loss"]))
            trace["gate"].append(float(m["gate_loss"]))
            trace["psnr"].append(float(m["psnr"]))
            _dump(label, iters, trace, v)
            print(f"[{label} {it}/{iters}] "
                  f"photo={float(m['photo_loss']):.5f} "
                  f"gate={float(m['gate_loss']):.3f} "
                  f"psnr={float(m['psnr']):.2f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    return trace


def _dump(side, iters, trace, variant=None):
    # incremental: a killed long run still leaves its curve on disk
    v = variant or {}
    out = pathlib.Path(__file__).parent / f"collapse_{side}_{iters}.json"
    out.write_text(json.dumps(
        {"side": side, "iters": iters,
         "batch": v.get("batch", BATCH), "width": WIDTH,
         "experts": EXPERTS, "samples": v.get("samples", SAMPLES),
         "lr": LR, "l_aux_wt": L_AUX_WT, **trace}, indent=1))


def compare(iters: int):
    """Collapse verdict across ALL recorded curves (base jax/torch plus
    every bisect cell collapse_jax_*_<iters>.json): the signature is the
    gate loss leaving its plateau (r3 TPU observation: 1.09 -> 3.09 at
    ~9.5k). A side 'collapses' when its gate loss after warmup exceeds
    plateau_median + max(10 * plateau_MAD, 0.25) (plateau = steps 2k..6k;
    the absolute floor keeps tight-plateau transient blips — e.g. a
    one-window 1.03 -> 1.17 excursion that returns — from counting; the
    real r3 signature is a +2.0 excursion that sticks) and stays above it
    for >= 3 consecutive samples."""
    out = {}
    here = pathlib.Path(__file__).parent
    sides = sorted(
        f.name[len("collapse_"):-len(f"_{iters}.json")]
        for f in here.glob(f"collapse_*_{iters}.json"))
    for side in sides:
        f = here / f"collapse_{side}_{iters}.json"
        d = json.loads(f.read_text())
        step = np.asarray(d["step"])
        gate = np.asarray(d["gate"])
        psnr = np.asarray(d["psnr"])
        plat = gate[(step >= 2000) & (step <= 6000)]
        med = float(np.median(plat))
        mad = float(np.median(np.abs(plat - med))) or 1e-6
        thr = med + max(10 * mad, 0.25)
        above = (gate > thr) & (step > 6000)
        runlen = 0
        collapse_step = None
        for s, a in zip(step, above):
            runlen = runlen + 1 if a else 0
            if runlen >= 3 and collapse_step is None:
                collapse_step = int(s)
        out[side] = {
            "steps_done": int(step[-1]),
            "gate_plateau_median": round(med, 4),
            "gate_threshold": round(thr, 4),
            "gate_max_after_6k": round(float(gate[step > 6000].max()), 4)
            if (step > 6000).any() else None,
            "collapse_step": collapse_step,
            "final_psnr_median_last10": round(
                float(np.median(psnr[-10:])), 2),
        }
    print(json.dumps(out, indent=1))
    return out


def main():
    side, iters, platform = "jax", 16000, "cpu"
    variant: dict = {}
    for a in sys.argv[1:]:
        if a.startswith("--side="):
            side = a.split("=")[1]
        if a.startswith("--iters="):
            iters = int(a.split("=")[1])
        if a.startswith("--platform="):
            platform = a.split("=")[1]
        if a == "--amp":
            variant["amp"] = True
        if a.startswith("--perturb="):
            variant["perturb"] = float(a.split("=")[1])
        if a.startswith("--batch="):
            variant["batch"] = int(a.split("=")[1])
        if a.startswith("--samples="):
            variant["samples"] = int(a.split("=")[1])
        if a.startswith("--init="):
            variant["init"] = a.split("=")[1]
        if a.startswith("--dispatch="):
            variant["dispatch"] = a.split("=")[1]
    if "--compare" in sys.argv[1:]:
        compare(iters)
        return
    if side == "jax":
        label = "jax" if platform == "cpu" else f"jax_{platform}"
        for k in sorted(variant):
            label += f"_{k}-{variant[k]}"
        trace = run_jax(iters, platform=platform, label=label,
                        variant=variant)
    else:
        label = side
        for k in sorted(variant):
            label += f"_{k}-{variant[k]}"
        trace = run_torch(iters, label=label, variant=variant)
    _dump(label, iters, trace, variant)
    print(f"wrote collapse_{label}_{iters}.json")


if __name__ == "__main__":
    main()
