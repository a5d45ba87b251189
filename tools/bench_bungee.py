"""Third headline workload: Bungee-NeRF (Transamerica/56Leonard) training step.

    python tools/bench_bungee.py [chunk ...]

Measures training-step throughput of the published Bungee configuration
(reference README.md:139-162: global batch 4096 over 4 GPUs -> 1024
rays/chip, 65 coarse + 65 fine mip samples, width-256 7-layer top-1
4-expert MoE, sigma noise 1.0, fp32 — the published command passes
--no_amp) built from the checked-in configs/switch_nerf/bungee.yaml, and
prints one JSON line with rays/s/chip + analytic-model-FLOP MFU (fp32
peak is the bf16 peak halved on v5e). Run alone — the axon compile
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

from bench import V5E_BF16_PEAK_FLOPS  # noqa: E402
from tools.bench_mission_bay import analytic_mip_flops  # noqa: E402

# the published command trains on 4x RTX 3090 at global batch 4096
PER_CHIP_BATCH = 4096 // 4


def bungee_hparams(batch_size: int, chunk: int):
    from switch_nerf_tpu.config import get_opts_nerf, parse_args
    cfg_path = (pathlib.Path(__file__).resolve().parent.parent
                / "configs/switch_nerf/bungee.yaml")
    h = parse_args(get_opts_nerf(), [
        f"--config_file={cfg_path}",
        "--exp_name=/tmp/bench_bungee", "--dataset_path=/tmp/none",
        "--use_moe", "--use_balance_loss", "--moe_expert_type=expertmlp",
        "--moe_train_batch", "--moe_test_batch",
        "--moe_capacity_factor=1.0", "--batch_prioritized_routing",
        "--moe_l_aux_wt=0.0005", "--no_amp",
        "--use_moe_external_gate", "--use_gate_input_norm",
        "--use_sigma_noise", "--sigma_noise_std=1.0",
        "--moe_expert_num=4",
        f"--batch_size={batch_size}",
    ])
    h.model_chunk_size = chunk
    h.train_iterations = 500000
    return h


def bench(batch_size: int, chunk: int, steps: int = 20) -> float:
    from __graft_entry__ import _make_batch
    from switch_nerf_tpu.models.model_utils import get_nerf
    from switch_nerf_tpu.trainer import (SceneInfo, create_train_state,
                                         make_train_step,
                                         render_config_from_hparams)
    h = bungee_hparams(batch_size, chunk)
    assert h.use_mip and not h.amp and h.appearance_dim == 0
    model = get_nerf(h, appearance_count=0)
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
    chunks = [int(c) for c in sys.argv[1:]] or [8192]
    results = {}
    for c in chunks:
        results[c] = round(bench(PER_CHIP_BATCH, c), 1)
    best_chunk = max(results, key=results.get)
    h = bungee_hparams(PER_CHIP_BATCH, best_chunk)
    flops = analytic_mip_flops(h, appearance_count=0)
    dt = PER_CHIP_BATCH / results[best_chunk]
    print(json.dumps({
        "metric": "rays_per_sec_per_chip_bungee_b4096_global",
        "value": results[best_chunk],
        "unit": "rays/s",
        "per_chunk": results,
        # fp32 step (published --no_amp): v5e fp32 peak = bf16 peak / 2
        "mfu_fp32_peak": round(flops / dt / (V5E_BF16_PEAK_FLOPS / 2), 4),
        "model_tflops_per_step": round(flops / 1e12, 3),
    }))


if __name__ == "__main__":
    main()
