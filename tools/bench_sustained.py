"""Sustained END-TO-END Runner.train throughput on the real chip.

Round-4 verdict item 2: bench.py measures the hot loop only (one
device-resident batch re-fed, no host feed, no TB, no checkpoints). The
reference's implied baseline (35 h => 4,064 rays/s/GPU) includes its whole
train loop — data pipeline, meters, TB, periodic checkpoints (reference
runner.py:571-741). This tool runs the REAL Runner.train on an on-disk
chunked synthetic Building-scale dataset with the TensorBoard writer active
and the checkpoint interval firing, and reports the steady-state rate next
to the hot-loop number, split into the reference's own meter fields
(data_sample_time / fwd_bwd_time, reference runner.py:581-595).

Usage:  python tools/bench_sustained.py [--iters=400]
Writes tools/bench_sustained_result.json.
"""
import json
import logging
import pathlib
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

ROOT = pathlib.Path(__file__).resolve().parent.parent
SCENE = ROOT / ".bench_scene"           # synthetic dataset, reused
CHUNKS = ROOT / ".bench_scene_chunks"   # chunked form, reused

N_TRAIN_IMAGES = 8
W = H = 512


def build_scene() -> pathlib.Path:
    """Synthetic Mega-NeRF-format scene (coordinates.pt + metadata/ +
    rgbs/): 8 train + 1 val images at 512x512 => ~2.1M train rays, enough
    for several hundred b1024 steps without repeating a chunk cycle."""
    import torch
    from PIL import Image

    if (SCENE / "coordinates.pt").exists():
        return SCENE
    rng = np.random.default_rng(0)
    for split, names in (("train", [f"{i:03d}" for i in
                                    range(N_TRAIN_IMAGES)]),
                         ("val", [f"{N_TRAIN_IMAGES:03d}"])):
        (SCENE / split / "metadata").mkdir(parents=True, exist_ok=True)
        (SCENE / split / "rgbs").mkdir(parents=True, exist_ok=True)
        for name in names:
            c2w = np.eye(3, 4, dtype=np.float32)
            c2w[:, 3] = rng.normal(0, 0.1, 3).astype(np.float32)
            c2w[0, 3] -= 0.5
            torch.save({"c2w": torch.tensor(c2w), "W": W, "H": H,
                        "intrinsics": torch.tensor(
                            [500.0, 500.0, W / 2, H / 2])},
                       SCENE / split / "metadata" / f"{name}.pt")
            img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            Image.fromarray(img).save(SCENE / split / "rgbs" / f"{name}.jpg")
    import torch as _t
    _t.save({"origin_drb": _t.zeros(3), "pose_scale_factor": 10.0},
            SCENE / "coordinates.pt")
    return SCENE


_ITER_RE = re.compile(r"iter (\d+) (.*?)(?: rays/s=(\d+(?:\.\d+)?))?$")


class _WindowCapture(logging.Handler):
    """Parses the runner's per-i_print meter lines (the reference's own
    reporting protocol) into structured windows."""

    def __init__(self):
        super().__init__()
        self.windows = []

    def emit(self, record):
        m = _ITER_RE.match(record.getMessage())
        if not m:
            return
        fields = {}
        for kv in m.group(2).split():
            if "=" in kv:
                k, v = kv.split("=", 1)
                try:
                    fields[k] = float(v)
                except ValueError:
                    pass
        fields["iter"] = int(m.group(1))
        if m.group(3):
            fields["rays_per_sec"] = float(m.group(3))
        self.windows.append(fields)


def main():
    iters = 400
    for a in sys.argv[1:]:
        if a.startswith("--iters="):
            iters = int(a.split("=")[1])

    from bench import _wait_for_backend
    _wait_for_backend()
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from __graft_entry__ import _building_hparams
    from switch_nerf_tpu.config import get_opts, parse_args
    from switch_nerf_tpu.runner import Runner

    scene = build_scene()
    exp = pathlib.Path(tempfile.mkdtemp(prefix="bench_sustained_"))

    h = parse_args(get_opts(), [
        "--exp_name", str(exp), "--dataset_path", str(scene)])
    # the published Building architecture + command knobs, exactly as
    # bench.py's hot loop measures them (width-256 7-layer 8-expert MoE,
    # bg NeRF, 256+512 samples, bf16 amp, b1024/chip, chunk 16384)
    prod = _building_hparams(tiny=False)
    for k in ("use_moe", "use_moe_external_gate", "use_gate_input_norm",
              "batch_prioritized_routing", "moe_train_batch",
              "moe_capacity_factor", "moe_l_aux_wt", "moe_expert_num",
              "amp", "bg_nerf", "appearance_dim", "model"):
        setattr(h, k, getattr(prod, k))
    h.coarse_samples, h.fine_samples = 256, 512
    h.model_chunk_size = 8192     # r5 optimum under the unroll=2 default
    h.batch_size = 1024
    h.use_sigma_noise = True
    h.sigma_noise_std = 1.0
    h.train_iterations = iters
    h.ray_altitude_range = [-30.0, 5.0]
    h.near = 0.5
    # end-to-end path: on-disk chunks + prefetch + TB + checkpoints
    h.dataset_type = "filesystem"
    h.chunk_paths = [str(CHUNKS)]
    h.num_chunks = 4
    h.i_print = 50
    h.ckpt_interval = max(iters // 2, 1)   # >=1 orbax save mid-window
    h.val_interval = 10 ** 9

    t0 = time.time()
    runner = Runner(h)
    # attach AFTER Runner init: setup_logger clears root handlers
    cap = _WindowCapture()
    logging.getLogger().addHandler(cap)
    runner.train()
    total = time.time() - t0
    logging.getLogger().removeHandler(cap)

    # steady state: drop the first two windows (device compile + queue
    # drain); the remainder still contains the mid-run checkpoint save,
    # so report (a) the rays/total-wall sustained rate over those windows
    # (ckpt INCLUDED, at this run's deliberately aggressive interval) and
    # (b) the ckpt-free window mean — the number comparable to the
    # reference's data_sample/fwd_bwd meters, which also exclude saves
    steady = [w for w in cap.windows
              if w.get("rays_per_sec") and w["iter"] > 2 * h.i_print]
    assert steady, f"no steady windows captured: {cap.windows}"
    walls = [h.i_print * h.batch_size / w["rays_per_sec"] for w in steady]
    rate = len(steady) * h.i_print * h.batch_size / sum(walls)

    def has_ckpt(w_iter):
        # the save at step s is timed into the window AFTER its print
        # (t_start resets at print, then the save runs): s in [lo, hi)
        lo, hi = w_iter - h.i_print, w_iter
        return any(s > 0 and s % h.ckpt_interval == 0
                   for s in range(lo, hi))
    free = [w for w in steady if not has_ckpt(w["iter"])] or steady
    rate_nockpt = float(np.mean([w["rays_per_sec"] for w in free]))
    data_t = float(np.mean([w["data_sample_time"] for w in steady]))
    fwd_t = float(np.mean([w["fwd_bwd_time"] for w in steady]))

    # hot-loop companion from the LATEST recorded bench round, by round
    # NUMBER (lexicographic sort would misorder r9/r10). NOTE the basis
    # mismatch: the recorded headline is the NOISE-FREE program while
    # this tool trains the published-exact noise-ON one (~1.1% slower,
    # see rendering.py sigma_noise save), so the pct below is slightly
    # conservative; STATUS.md reports the matched-program comparison.
    def _round_num(p):
        import re as _re
        m = _re.search(r"BENCH_r(\d+)\.json$", p.name)
        return int(m.group(1)) if m else -1

    hot = None
    hot_src = None
    for rec in sorted(ROOT.glob("BENCH_r*.json"), key=_round_num,
                      reverse=True):
        try:
            hot = float(json.loads(rec.read_text())["parsed"]["value"])
            hot_src = rec.name
            break
        except Exception:
            print(f"warning: unreadable bench record {rec.name}, "
                  f"falling back to an older round", file=sys.stderr)
            continue

    result = {
        "metric": "sustained_runner_train_rays_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "rays/s",
        "value_excl_ckpt_windows": round(rate_nockpt, 1),
        "iters": iters,
        "data_sample_time_s": round(data_t, 5),
        "fwd_bwd_time_s": round(fwd_t, 5),
        "data_share_pct": round(100 * data_t / (data_t + fwd_t), 2),
        "windows": cap.windows,
        # noise-FREE headline vs this tool's noise-ON program: pcts are
        # ~1% conservative (see the lookup note above)
        "hot_loop_noise_free_headline": hot,
        "hot_loop_source": hot_src,
        "sustained_over_headline_pct": (round(100 * rate / hot, 2)
                                        if hot else None),
        "nockpt_over_headline_pct": (round(100 * rate_nockpt / hot, 2)
                                     if hot else None),
        "total_wall_s": round(total, 1),
        "ckpt_interval": h.ckpt_interval,
        "device": str(jax.devices()[0]),
    }
    out = pathlib.Path(__file__).parent / "bench_sustained_result.json"
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps({k: v for k, v in result.items() if k != "windows"}))
    shutil.rmtree(exp, ignore_errors=True)


if __name__ == "__main__":
    main()
