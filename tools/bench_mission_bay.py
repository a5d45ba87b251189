"""Second headline workload: Mission Bay (Block-NeRF) mip training step.

    python tools/bench_mission_bay.py [chunk ...]

Measures training-step throughput of the published Mission Bay
configuration (reference README.md:103-133: global batch 13312 over
8 GPUs -> 1664 rays/chip, 513 coarse + 513 fine samples, width-512
7-layer top-1 8-expert MoE, mip IPE, no background NeRF, bf16) built
from the checked-in configs/switch_nerf/mission_bay.yaml, and prints one
JSON line with rays/s/chip + analytic-model-FLOP MFU. Run alone — the
axon compile service serializes big requests.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from bench import V5E_BF16_PEAK_FLOPS, _mlp_macs  # noqa: E402

# The reference trains Mission Bay on 8x RTX 3090 ("set according to the
# memory of RTX 3090"); per-3090 share of the global 13312-ray batch:
PER_CHIP_BATCH = 13312 // 8


def mission_bay_hparams(batch_size: int, chunk: int):
    from switch_nerf_tpu.config import get_opts, parse_args
    cfg_path = (pathlib.Path(__file__).resolve().parent.parent
                / "configs/switch_nerf/mission_bay.yaml")
    h = parse_args(get_opts(), [
        f"--config_file={cfg_path}",
        "--exp_name=/tmp/bench_mb", "--dataset_path=/tmp/none",
        "--use_moe_external_gate", "--use_gate_input_norm",
        "--batch_prioritized_routing", "--moe_capacity_factor=1.0",
        "--moe_l_aux_wt=0.0005", "--moe_train_batch",
        f"--batch_size={batch_size}",
    ])
    h.model_chunk_size = chunk
    h.train_iterations = 500000
    return h


def analytic_mip_flops(h, appearance_count: int = 8) -> float:
    """fwd+bwd (3x fwd) matmul FLOPs of the mip step: the fine pass
    evaluates fine_samples fresh points (no coarse merge, unlike the
    classic path — rendering_mip.py resamples)."""
    g = h.model["layers"]
    macs = sum(_mlp_macs(g[k])
               for k in ("xyz", "0", "1", "2", "sigma", "color",
                         "moe_external_gate"))
    macs += g["0"]["gate_dim"] * h.moe_expert_num
    macs += appearance_count * h.appearance_dim
    pts = h.batch_size * (h.coarse_samples + h.fine_samples)
    return 3.0 * 2.0 * macs * pts


def bench(batch_size: int, chunk: int, steps: int = 10) -> float:
    from __graft_entry__ import _make_batch
    from switch_nerf_tpu.models.model_utils import get_nerf
    from switch_nerf_tpu.trainer import (SceneInfo, create_train_state,
                                         make_train_step,
                                         render_config_from_hparams)
    h = mission_bay_hparams(batch_size, chunk)
    assert h.use_mip and h.bg_nerf is False
    model = get_nerf(h, appearance_count=8)
    state = create_train_state(jax.random.PRNGKey(0), h, model, None)
    cfg = render_config_from_hparams(h)
    step = jax.jit(make_train_step(model, None, h, cfg, SceneInfo(),
                                   mip=True),
                   donate_argnums=0)
    batch = _make_batch(h, batch_size)
    import jax.numpy as jnp
    batch["radii"] = jnp.full((batch_size, 1), 2.5e-3, jnp.float32)

    state, metrics = step(state, batch)
    assert float(metrics["loss"]) == float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch)
    float(metrics["loss"])              # true device sync through the tunnel
    return batch_size / ((time.perf_counter() - t0) / steps)


def main():
    from bench import _wait_for_backend
    _wait_for_backend()
    chunks = [int(c) for c in sys.argv[1:]] or [16384]
    results = {}
    for c in chunks:
        results[c] = round(bench(PER_CHIP_BATCH, c), 1)
    best_chunk = max(results, key=results.get)
    h = mission_bay_hparams(PER_CHIP_BATCH, best_chunk)
    flops = analytic_mip_flops(h)
    dt = PER_CHIP_BATCH / results[best_chunk]
    print(json.dumps({
        "metric": "rays_per_sec_per_chip_mission_bay_b13312_global",
        "value": results[best_chunk],
        "unit": "rays/s",
        "per_chunk": results,
        "mfu": round(flops / dt / V5E_BF16_PEAK_FLOPS, 4),
        "model_tflops_per_step": round(flops / 1e12, 3),
    }))


if __name__ == "__main__":
    main()
