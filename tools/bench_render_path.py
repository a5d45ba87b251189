"""Sweep the serving/render path: eval-step rays/s vs (batch, model_chunk).

    python tools/bench_render_path.py

Whole-image rendering (Runner.render_image / eval_image) pulls
`image_pixel_batch_size` rays per compiled eval step and chunks the point
stream by `model_chunk_size`. Train tuning found fg chunk 16384 optimal,
but the eval step has no backward/remat — the optimum may differ. This
sweep measures the padded-dispatch eval step (what every published eval
command selects) on the Building config and prints one JSON line with the
grid + the best setting. Run alone — the axon compile service serializes
big requests.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def bench(batch_size: int, chunk: int, steps: int = 10) -> float:
    from __graft_entry__ import _building_hparams, _make_batch
    from switch_nerf_tpu.models.model_utils import get_bg_nerf, get_nerf
    from switch_nerf_tpu.trainer import (SceneInfo, create_train_state,
                                         make_eval_step,
                                         render_config_from_hparams)
    h = _building_hparams(tiny=False)
    h.coarse_samples, h.fine_samples = 256, 512
    h.model_chunk_size = chunk
    h.batch_size = batch_size
    h.moe_test_batch = True                # padded (published eval flags)
    model = get_nerf(h, appearance_count=8)
    bg_model = get_bg_nerf(h, 8)
    state = create_train_state(jax.random.PRNGKey(0), h, model, bg_model)
    cfg = render_config_from_hparams(h)
    step = jax.jit(make_eval_step(model, bg_model, h, cfg, SceneInfo()))
    batch = _make_batch(h, h.batch_size)

    out = step(state.params, batch)
    float(out["rgb_fine"][0, 0])           # real sync through the tunnel
    t0 = time.perf_counter()
    for _ in range(steps):
        out = step(state.params, batch)
    float(out["rgb_fine"][0, 0])
    dt = (time.perf_counter() - t0) / steps
    return batch_size / dt


def main():
    from bench import _wait_for_backend
    _wait_for_backend()
    grid = {}
    for bs in (1024, 4096, 8192):
        for chunk in (16384, 65536):
            key = f"b{bs}_c{chunk}"
            grid[key] = round(bench(bs, chunk), 1)
            print(f"# {key}: {grid[key]} rays/s", flush=True)
    best = max(grid, key=grid.get)
    print(json.dumps({"grid": grid, "best": best,
                      "best_rays_per_sec": grid[best]}))


if __name__ == "__main__":
    main()
