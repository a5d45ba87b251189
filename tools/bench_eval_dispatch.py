"""Measure eval-step throughput: nodrop (ragged) vs padded dispatch.

    python tools/bench_eval_dispatch.py

VERDICT r1 item 6: the reference's default eval path (no --moe_test_batch)
is the nobatch/variable-size dispatcher; ours maps it to the sort-based
ragged path. Every published eval command passes --moe_test_batch (padded),
but the default path's throughput must be known. Building config, batch
1024/chip, forward (eval) step only. Run alone — the axon remote-compile
service serializes big requests.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def bench(moe_test_batch: bool, steps: int = 10) -> float:
    from __graft_entry__ import _building_hparams, _make_batch
    from switch_nerf_tpu.models.model_utils import get_bg_nerf, get_nerf
    from switch_nerf_tpu.trainer import (SceneInfo, create_train_state,
                                         make_eval_step,
                                         render_config_from_hparams)
    h = _building_hparams(tiny=False)
    h.coarse_samples, h.fine_samples = 256, 512
    h.model_chunk_size = 16384
    h.batch_size = 1024
    h.moe_test_batch = moe_test_batch      # -> eval_dispatch padded/nodrop
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
    return h.batch_size / dt


def main():
    from bench import _wait_for_backend
    _wait_for_backend()
    r_nodrop = bench(False)
    r_padded = bench(True)
    print(json.dumps({
        "eval_rays_per_sec_nodrop": round(r_nodrop, 1),
        "eval_rays_per_sec_padded": round(r_padded, 1),
        "padded_over_nodrop": round(r_padded / r_nodrop, 3),
    }))


if __name__ == "__main__":
    main()
