"""Extract a PlenOctree-style sparse octree from a trained (MoE) NeRF.

Parity target: switch_nerf/scripts/create_octree_moe.py:41-297 — the
reference drives the svox N3Tree C++/CUDA extension; this version builds the
octree host-side from device-evaluated sigma/color grids
(switch_nerf_tpu.octree).

Usage (an SH model, i.e. --sh_deg set and --pos_dir_dim 0, mirrors the
reference's requirement):

    python scripts/create_octree_moe.py <training flags> \
        --ckpt_path=<ckpt> --output=tree.npz \
        --init_grid_depth=8 --alpha_thresh=0.01 --masking_mode=sigma
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from switch_nerf_tpu.config import get_opts_base, parse_args  # noqa: E402


def get_extraction_opts():
    parser = get_opts_base()
    parser.add_argument("--dataset_path", type=str, required=True)
    parser.add_argument("--exp_name", type=str, default="/tmp/octree_exp")
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--alpha_thresh", type=float, default=0.01)
    parser.add_argument("--scale_alpha_thresh", type=float, default=0.01)
    parser.add_argument("--init_grid_depth", type=int, default=8)
    parser.add_argument("--samples_per_cell", type=int, default=8)
    parser.add_argument("--masking_mode", type=str, default="sigma",
                        choices=["sigma", "weight"])
    parser.add_argument("--weight_thresh", type=float, default=0.001)
    parser.add_argument("--embedding_index", type=int, default=0)
    parser.add_argument("--camera_params", type=int, nargs="+",
                        default=[800, 800, 400, 400, 400, 400])
    return parser


def main():
    hparams = parse_args(get_extraction_opts())

    import jax
    import jax.numpy as jnp

    from switch_nerf_tpu.octree import (Octree, build_octree, grid_points,
                                        grid_weights,
                                        sigma_threshold_from_alpha)
    from switch_nerf_tpu.runner import Runner

    runner = Runner(hparams, set_experiment_path=False)
    state = runner._load_eval_state()
    model = runner.nerf
    reso = 2 ** hparams.init_grid_depth
    fmt = f"SH{(hparams.sh_deg + 1) ** 2}" if hparams.sh_deg is not None \
        else "RGBA"

    @jax.jit
    def _query_jit(params, pts_xyz):
        parts = [pts_xyz]
        if hparams.pos_dir_dim > 0:
            d = jnp.zeros_like(pts_xyz)
            d = d.at[:, 0].set(1.0)
            parts.append(d)
        if hparams.appearance_dim > 0:
            parts.append(jnp.full((pts_xyz.shape[0], 1),
                                  hparams.embedding_index, jnp.float32))
        pts = jnp.concatenate(parts, -1)
        out = model.apply({"params": params}, pts, deterministic=True)
        return out["outputs"] if isinstance(out, dict) else out

    def query(pts_np):
        """pts [N, 3] -> model outputs [N, C] (appearance pinned).

        jitted + padded to a fixed chunk: the 256^3 grid makes ~1000
        calls, and eager dispatch (~1 ms/call through the remote tunnel)
        would dominate extraction time (same pattern as the jitted
        point_fn in runner._export_point_clouds)."""
        n = pts_np.shape[0]
        bs = hparams.model_chunk_size
        pad = (-n) % bs
        if pad:
            pts_np = np.concatenate(
                [pts_np, np.repeat(pts_np[-1:], pad, 0)], 0)
        outs = [np.asarray(_query_jit(
            state.params["nerf"],
            jnp.asarray(pts_np[i:i + bs], jnp.float32)))
            for i in range(0, pts_np.shape[0], bs)]
        return np.concatenate(outs)[:n]

    # ---- step 0: auto-scale to the occupied bbox ---------------------------
    center = [0.0, 0.0, 0.0]
    radius = [1.0, 1.0, 1.0]
    if runner.sphere_center is not None:
        center = np.asarray(runner.sphere_center).tolist()
        radius = np.asarray(runner.sphere_radius).tolist()
    sigma_thresh = sigma_threshold_from_alpha(hparams.scale_alpha_thresh,
                                              reso)
    pts = grid_points(center, radius, reso)
    sig = query(pts)[:, -1]
    occ_pts = pts[sig >= sigma_thresh]
    if occ_pts.shape[0] == 0:
        raise SystemExit("no occupied cells above scale_alpha_thresh")
    lc = occ_pts.min(0) - np.asarray(radius) / reso
    uc = occ_pts.max(0) + np.asarray(radius) / reso
    center = ((lc + uc) * 0.5).tolist()
    radius = ((uc - lc) * 0.5).tolist()
    print(f"auto-scaled bbox: center={center} radius={radius}")

    # ---- step 1: grid eval + masking --------------------------------------
    pts = grid_points(center, radius, reso)
    sig = query(pts)[:, -1]
    sigma_grid = sig.reshape(reso, reso, reso)
    if hparams.masking_mode == "sigma":
        thr = sigma_threshold_from_alpha(hparams.alpha_thresh, reso)
        occupied = sigma_grid >= thr
    else:
        poses = np.stack([m.c2w for m in runner.train_items])
        cam = tuple(hparams.camera_params)
        maxw = grid_weights(sigma_grid, poses, center, radius, cam)
        occupied = maxw >= hparams.weight_thresh
    print(f"occupied cells: {int(occupied.sum())}/{reso**3}")

    # ---- step 2+3: build tree with averaged leaf payloads -----------------
    rng = np.random.default_rng(0)
    rad = np.asarray(radius, np.float32)
    cen = np.asarray(center, np.float32)

    def leaf_payload(cells):
        n = cells.shape[0]
        spc = hparams.samples_per_cell
        offs = rng.random((n, spc, 3)).astype(np.float32)
        world = (cells[:, None, :] + offs) / reso * (2 * rad) + (cen - rad)
        flat = world.reshape(-1, 3)
        outs = query(flat)
        outs = outs.reshape(n, spc, -1)
        return outs.mean(axis=1)

    tree = build_octree(occupied, leaf_payload, center, radius, fmt)
    tree.save(hparams.output)
    print(f"wrote {hparams.output}: {tree.data.shape[0]} leaves, "
          f"{tree.child.shape[0]} internal nodes, format {fmt}")


if __name__ == "__main__":
    main()
