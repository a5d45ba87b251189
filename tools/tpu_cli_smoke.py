"""On-hardware smoke of the PRODUCTION CLI path: train -> resume -> eval.

The CPU e2e suite (tests/test_runner_e2e.py) drives Runner in-process on
the virtual mesh, and tools/convergence_check.py trains via the trainer
API on the real chip — this tool closes the remaining integration gap by
running the actual console entry points (`python -m switch_nerf_tpu.train`
/ `.eval_image`, i.e. the crash-wrapped CLI -> init_multi_host -> Runner
stack, reference switch_nerf/train.py:10-28 + eval_image.py:19-26) as
subprocesses against the REAL TPU chip, on a tiny synthetic Mega-NeRF
scene with a 4-expert MoE model (bf16 amp, BPR routing, bg NeRF on):

  1. train 20 steps (checkpoints at 10/20, one mid-run validation),
  2. resume from the step-10 checkpoint and train to 20 again,
  3. eval_image from the step-20 checkpoint (metrics.txt protocol).

Prints ONE JSON line {"metric": "tpu_cli_smoke", ...} and exits nonzero
on any failure. Uses the shared compile cache so repeat runs are fast.
"""
import json
import math
import os
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def build_dataset(root: Path) -> None:
    """Synthetic Mega-NeRF layout: coordinates.pt + metadata.pt + rgbs
    (mirrors tests/test_runner_e2e.py::mega_dataset)."""
    import numpy as np
    import torch
    from PIL import Image

    w, h = 24, 16
    rng = np.random.default_rng(0)
    for split, names in (("train", ["000", "001", "002", "003"]),
                         ("val", ["004"])):
        (root / split / "metadata").mkdir(parents=True)
        (root / split / "rgbs").mkdir(parents=True)
        for name in names:
            c2w = np.eye(3, 4, dtype=np.float32)
            c2w[:, 3] = rng.normal(0, 0.1, 3).astype(np.float32)
            c2w[0, 3] -= 0.5
            torch.save({"c2w": torch.tensor(c2w), "W": w, "H": h,
                        "intrinsics": torch.tensor([20.0, 20.0, w / 2,
                                                    h / 2])},
                       root / split / "metadata" / f"{name}.pt")
            img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
            Image.fromarray(img).save(root / split / "rgbs" / f"{name}.jpg")
    torch.save({"origin_drb": torch.zeros(3),
                "pose_scale_factor": 10.0}, root / "coordinates.pt")


# tiny NeRFMoE layer graph (building.yaml structure at width 16;
# in_ch arithmetic: xyz PE = 3*(1+2*pos_xyz_dim)=15, dir PE =
# 3*(1+2*pos_dir_dim)=9, color head in = 16 + 9 + appearance(4) = 29)
MODEL_YAML = """\
model:
  layer_num_main: 3
  sigma_tag: 0
  dir_tag: 1
  color_tag: 2
  layers:
    xyz:
      {in_ch: 15, h_ch: 0, out_ch: 16, num: 1, type: mlp, act: none}
    '0':
      {in_ch: 16, h_ch: 16, out_ch: 16, num: 2, skips: [1],
       init_factor: 1.0, type: moe, act: relu, gate_type: top, k: 1,
       fp32_gate: true, gate_dim: 16}
    '1':
      {in_ch: 16, h_ch: 0, out_ch: 16, num: 1, type: mlp, act: none}
    '2':
      {in_ch: 29, h_ch: 0, out_ch: 8, num: 1, type: mlp, act: relu}
    sigma:
      {in_ch: 16, h_ch: 0, out_ch: 1, num: 1, type: mlp, act: none}
    color:
      {in_ch: 8, h_ch: 0, out_ch: 3, num: 1, type: mlp, act: none}
    moe_external_gate:
      {in_ch: 16, h_ch: 16, out_ch: 16, num: 2, type: mlp, act: none,
       out_skip: false}
    gate_input_norm:
      {in_ch: 16, h_ch: 0, out_ch: 0, num: 1, type: layernorm}
"""


def common_flags(data: Path, exp: Path, cfg_file: Path):
    return [
        "--config_file", str(cfg_file),
        "--exp_name", str(exp), "--dataset_path", str(data),
        "--dataset_type", "memory",
        "--near", "0.5", "--ray_altitude_range", "-30", "5",
        "--pos_xyz_dim", "2", "--pos_dir_dim", "1", "--appearance_dim", "4",
        "--layers", "2", "--skip_layers", "1",
        "--layer_dim", "16", "--bg_layer_dim", "16",
        "--coarse_samples", "4", "--fine_samples", "4",
        "--model_chunk_size", "4096",
        "--batch_size", "256", "--image_pixel_batch_size", "128",
        "--train_iterations", "20", "--ckpt_interval", "10",
        "--val_interval", "15", "--i_print", "5",
        "--use_moe", "--use_moe_external_gate", "--use_gate_input_norm",
        "--moe_expert_num", "4", "--moe_capacity_factor", "1.0",
        "--batch_prioritized_routing", "--moe_expert_type", "expertmlp",
        "--moe_l_aux_wt", "0.0005",
    ]


def run_cli(module: str, flags, timeout_s: int = 900):
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
    proc = subprocess.run(
        [sys.executable, "-m", module, *flags],
        cwd=str(REPO), env=env, timeout=timeout_s,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    if proc.returncode != 0:
        sys.stderr.write(proc.stdout[-4000:])
        raise SystemExit(
            f"{module} exited {proc.returncode} (tail above)")
    return proc.stdout


def main() -> None:
    from bench import _wait_for_backend
    _wait_for_backend()

    with tempfile.TemporaryDirectory(prefix="tpu_cli_smoke_") as td:
        tmp = Path(td)
        data = tmp / "data"
        data.mkdir()
        build_dataset(data)
        cfg_file = tmp / "model.yaml"
        cfg_file.write_text(MODEL_YAML)

        # 1. train 20 steps on the real chip through the production CLI
        exp1 = tmp / "exp_train"
        run_cli("switch_nerf_tpu.train", common_flags(data, exp1, cfg_file))
        models = next(exp1.glob("*/models"))
        steps = sorted(int(p.name) for p in models.iterdir()
                       if p.name.isdigit())
        assert steps == [10, 20], f"checkpoints {steps} != [10, 20]"

        # 2. resume from step 10, train to 20 again
        exp2 = tmp / "exp_resume"
        run_cli("switch_nerf_tpu.train",
                common_flags(data, exp2, cfg_file) + ["--ckpt_path",
                                                      str(models / "10")])
        models2 = next(exp2.glob("*/models"))
        resumed = sorted(int(p.name) for p in models2.iterdir()
                         if p.name.isdigit())
        assert resumed == [20], f"resumed checkpoints {resumed} != [20]"

        # 3. eval_image from the final checkpoint (metrics.txt protocol)
        exp3 = tmp / "exp_eval"
        out = run_cli("switch_nerf_tpu.eval_image",
                      common_flags(data, exp3, cfg_file)
                      + ["--ckpt_path", str(models / "20")])
        # PER-IMAGE metric files only (metrics_{i}.txt, 'psnr: x' lines) —
        # a bare glob also matches the 'Average val/...' summary
        # metrics.txt, and filesystem glob order made which one landed
        # first nondeterministic (observed flake)
        metrics = sorted(exp3.glob("**/metrics_*.txt"))
        assert metrics, f"no metrics_*.txt written; stdout tail: {out[-800:]}"
        text = metrics[0].read_text()
        psnr = None
        for line in text.splitlines():
            # exact key match — don't let psnr_mask/psnr_* variants shadow it
            if line.split(":")[0].strip().lower() == "psnr":
                psnr = float(line.split()[-1])
                break
        assert psnr is not None and math.isfinite(psnr), \
            f"no finite psnr:\n{text}"
        summary = sorted(exp3.glob("**/metrics.txt"))
        assert summary and "Average val/psnr: " in summary[0].read_text(), \
            "aggregate metrics.txt summary missing"

    print(json.dumps({"metric": "tpu_cli_smoke", "train_steps": 20,
                      "resume_from": 10, "eval_psnr": round(psnr, 3),
                      "ok": True}))


if __name__ == "__main__":
    main()
