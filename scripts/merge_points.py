"""Merge per-image per-expert point clouds into scene-level expert clouds.

Parity target: switch_nerf/scripts/merge_points.py:8-105 — for each expert
id, concatenate the matching PLYs across image directories with a random
downsample ratio, write one merged PLY per expert (plus the all-points
cloud).

Usage:
    python scripts/merge_points.py --data_path <exp>/eval_points \
        --merge_save_dir merged --down_scale 0.1 --moe_expert_num 8
"""
import argparse
import random
from pathlib import Path

import numpy as np

import sys
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from switch_nerf_tpu.utils.ply import read_ply_points, write_ply_points  # noqa: E402


def merge(data_path: Path, save_dir: Path, down_scale: float,
          expert_num: int, typ: str = "coarse", seed: int = 0,
          topk: int = 0):
    """topk selects which gate slot's clouds to merge (reference
    merge_points.py exposes --topk; top-1 gates only ever write slot 0)."""
    rng = np.random.default_rng(seed)
    save_dir.mkdir(parents=True, exist_ok=True)
    image_dirs = sorted(p for p in data_path.iterdir() if p.is_dir())

    patterns = {"all": f"*_{typ}_pts_rgba.ply"}
    for e in range(expert_num):
        patterns[f"exp_{e}"] = f"*_{typ}_pts_rgba_top_{topk}_exp_{e}.ply"

    for name, pattern in patterns.items():
        xyzs, rgbas = [], []
        for d in image_dirs:
            for ply in sorted(d.glob(pattern)):
                xyz, rgba = read_ply_points(ply)
                if down_scale < 1.0 and xyz.shape[0] > 0:
                    keep = rng.random(xyz.shape[0]) < down_scale
                    xyz, rgba = xyz[keep], rgba[keep]
                xyzs.append(xyz)
                rgbas.append(rgba)
        if not xyzs:
            continue
        xyz = np.concatenate(xyzs)
        rgba = np.concatenate(rgbas)
        out = save_dir / f"merged_{typ}_{name}.ply"
        write_ply_points(out, xyz, rgba)
        print(f"{out}: {xyz.shape[0]} points")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", type=str, required=True,
                   help="eval_points output directory (per-image subdirs)")
    p.add_argument("--merge_save_dir", type=str, required=True)
    p.add_argument("--down_scale", type=float, default=1.0)
    p.add_argument("--moe_expert_num", type=int, default=8)
    p.add_argument("--typ", type=str, default="coarse")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--topk", type=int, default=0,
                   help="gate slot to merge (reference --topk)")
    args = p.parse_args()
    merge(Path(args.data_path), Path(args.merge_save_dir), args.down_scale,
          args.moe_expert_num, args.typ, args.seed, topk=args.topk)


if __name__ == "__main__":
    main()
