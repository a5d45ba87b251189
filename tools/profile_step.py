"""Profile the benchmark train step and print an hlo_category time table.

    python tools/profile_step.py [--steps=5] [--no-bg] [--mission-bay]

Runs the exact bench.py workload under jax.profiler.trace, parses the
*.trace.json.gz device track (tid 3 = leaf ops), and aggregates device op
time by HLO category — the repeatable version of the round-1 ad-hoc
profiling (CLAUDE.md perf notes). Use ONE at a time: the axon
remote-compile service serializes big requests.
"""
import glob
import gzip
import json
import pathlib
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def build_step_mission_bay():
    """The second headline workload (see tools/bench_mission_bay.py)."""
    import jax.numpy as jnp

    from __graft_entry__ import _make_batch
    from bench_mission_bay import PER_CHIP_BATCH, mission_bay_hparams
    from switch_nerf_tpu.models.model_utils import get_nerf
    from switch_nerf_tpu.trainer import (SceneInfo, create_train_state,
                                         make_train_step,
                                         render_config_from_hparams)
    h = mission_bay_hparams(PER_CHIP_BATCH, 8192)
    model = get_nerf(h, appearance_count=8)
    state = create_train_state(jax.random.PRNGKey(0), h, model, None)
    cfg = render_config_from_hparams(h)
    step = jax.jit(make_train_step(model, None, h, cfg, SceneInfo(),
                                   mip=True),
                   donate_argnums=0)
    batch = _make_batch(h, h.batch_size)
    batch["radii"] = jnp.full((h.batch_size, 1), 2.5e-3, jnp.float32)
    return step, state, batch, h.batch_size


def build_step(bg: bool):
    from __graft_entry__ import _building_hparams, _make_batch
    from switch_nerf_tpu.models.model_utils import get_bg_nerf, get_nerf
    from switch_nerf_tpu.trainer import (SceneInfo, create_train_state,
                                         make_train_step,
                                         render_config_from_hparams)
    import os
    h = _building_hparams(tiny=False)
    h.coarse_samples, h.fine_samples = 256, 512
    # track bench.py's production chunk (8192 since the r5 unroll=2
    # default; SWITCH_NERF_BENCH_CHUNK overrides both tools the same way)
    h.model_chunk_size = int(os.environ.get("SWITCH_NERF_BENCH_CHUNK",
                                            "8192"))
    h.batch_size = 1024
    h.train_iterations = 500000
    h.bg_nerf = bg
    model = get_nerf(h, appearance_count=8)
    bg_model = get_bg_nerf(h, 8) if bg else None
    state = create_train_state(jax.random.PRNGKey(0), h, model, bg_model)
    cfg = render_config_from_hparams(h)
    step = jax.jit(make_train_step(model, bg_model, h, cfg, SceneInfo()),
                   donate_argnums=0)
    batch = _make_batch(h, h.batch_size)
    return step, state, batch


def parse_trace(trace_dir: str):
    """Aggregate device time by hlo_category on the 'XLA Ops' thread.

    `while.*` wrapper events OVERLAP their interior ops (both are
    recorded), so the wrappers are dropped from the totals and instead
    used to attribute leaf time to the enclosing scan loop.
    """
    import bisect

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {trace_dir}"
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    ops_tid = None
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name" \
                and e.get("args", {}).get("name") == "XLA Ops":
            ops_tid = (e["pid"], e["tid"])
    whiles, leaves = [], []
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) != ops_tid:
            continue
        if e.get("name", "").startswith("while"):
            whiles.append((e["ts"], e["ts"] + e.get("dur", 0), e["name"]))
        else:
            leaves.append(e)
    whiles.sort()
    starts = [w[0] for w in whiles]

    cat_time = defaultdict(float)
    op_time = defaultdict(float)
    loop_time = defaultdict(float)
    total = 0.0
    for e in leaves:
        dur = e.get("dur", 0) / 1e6           # seconds
        cat = e.get("args", {}).get("hlo_category", "?")
        cat_time[cat] += dur
        op_time[e.get("name", "?")] += dur
        i = bisect.bisect_right(starts, e["ts"]) - 1
        loop = "OUTSIDE"
        if i >= 0 and e["ts"] < whiles[i][1]:
            loop = whiles[i][2]
        loop_time[loop] += dur
        total += dur
    return cat_time, op_time, loop_time, total


def main():
    from bench import _wait_for_backend
    _wait_for_backend()
    steps = 5
    bg = True
    mission_bay = False
    for a in sys.argv[1:]:
        if a.startswith("--steps="):
            steps = int(a.split("=")[1])
        if a == "--no-bg":
            bg = False
        if a == "--mission-bay":
            mission_bay = True

    if mission_bay:
        step, state, batch, bsz = build_step_mission_bay()
        label = "mission_bay"
    else:
        step, state, batch = build_step(bg)
        bsz, label = 1024, f"bg={bg}"
    state, metrics = step(state, batch)
    float(metrics["loss"])                     # real sync through the tunnel

    trace_dir = tempfile.mkdtemp(prefix="switchnerf_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state, metrics = step(state, batch)
        float(metrics["loss"])
    wall = (time.perf_counter() - t0) / steps
    print(f"{label} steps={steps} wall/step={wall*1000:.1f} ms "
          f"({bsz/wall:.0f} rays/s/chip)")

    cat_time, op_time, loop_time, total = parse_trace(trace_dir)
    print(f"\ndevice time by hlo_category ({total/steps*1000:.1f} ms/step):")
    for cat, t in sorted(cat_time.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:32s} {t/steps*1000:9.2f} ms/step "
              f"{100*t/total:5.1f}%")
    print("\ntime by scan loop (while op):")
    for name, t in sorted(loop_time.items(), key=lambda kv: -kv[1]):
        print(f"  {name:16s} {t/steps*1000:8.2f} ms/step")
    print("\ntop 15 ops:")
    for name, t in sorted(op_time.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {name[:64]:64s} {t/steps*1000:8.2f} ms/step")
    print(f"\ntrace dir: {trace_dir}")


if __name__ == "__main__":
    main()
