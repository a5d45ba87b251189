"""Benchmark: training-step throughput on the flagship Switch-NeRF config.

Metric: rays/sec/chip on the Building-scene configuration — batch 8192 rays,
256 coarse + 512 fine samples, width-256 7-layer top-1 8-expert MoE with
external gate, bf16 compute (reference command: README.md:59-82).

Baseline: the reference publishes no throughput numbers (BASELINE.json
published == {}). We derive a documented estimate: the published setup runs
500k iterations at batch 8192 on 8x RTX 3090 in ~35 h (Switch-NeRF paper,
ICLR'23, Sec. 5 training setup), i.e. 500000*8192/(35*3600)/8 ~= 4064
rays/sec/GPU. vs_baseline = measured / 4064.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

BASELINE_RAYS_PER_SEC_PER_CHIP = 4064.0


def main():
    import jax
    from __graft_entry__ import _building_hparams, _make_batch
    from switch_nerf_tpu.models.model_utils import get_nerf
    from switch_nerf_tpu.trainer import (
        SceneInfo, create_train_state, make_train_step,
        render_config_from_hparams)

    h = _building_hparams(tiny=False)
    h.coarse_samples, h.fine_samples = 256, 512
    h.model_chunk_size = 131072
    h.batch_size = 8192
    h.train_iterations = 500000

    model = get_nerf(h, appearance_count=8)
    state = create_train_state(jax.random.PRNGKey(0), h, model, None, {})
    cfg = render_config_from_hparams(h)
    step = jax.jit(make_train_step(model, None, h, cfg, SceneInfo()))
    batch = _make_batch(h, h.batch_size)

    # compile + warmup
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])

    n_steps = 5
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / n_steps

    rays_per_sec = h.batch_size / dt
    print(json.dumps({
        "metric": "rays_per_sec_per_chip_building_b8192",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
