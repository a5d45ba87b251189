"""Sparse-octree (PlenOctree-style) extraction — svox-free.

Parity target: scripts/create_octree_moe.py (reference) which depends on the
svox N3Tree C++/CUDA extension. Here the octree is built host-side from
device-evaluated sigma/SH grids:

  * auto-scale: bound the occupied region by thresholding sigma on a dense
    grid (reference _auto_scale, create_octree_moe.py:62-106)
  * masking: 'sigma' (threshold) or 'weight' (max ray-marching weight per
    cell over the training cameras; reference _calculate_grid_weights)
  * refinement: occupied cells become leaves at full depth; the tree stores
    branch-2 internal nodes top-down
  * leaf payload: averaged (SH-coeff | rgb) + sigma over samples_per_cell
    stratified samples

Storage (npz):
    child   [n_internal, 8] int32   child index; >=0 internal, -1 empty,
                                    -(2+leaf_id) leaf
    data    [n_leaves, D]  float32  (payload + sigma last)
    center  [3], radius [3], depth, data_format (e.g. "SH9" / "RGBA")
"""
from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Optional, Tuple

import numpy as np


@dataclass
class Octree:
    child: np.ndarray          # [n_internal, 8] int32
    data: np.ndarray           # [n_leaves, D] float32
    center: np.ndarray         # [3]
    radius: np.ndarray         # [3]
    depth: int
    data_format: str

    def save(self, path):
        np.savez(path, child=self.child, data=self.data, center=self.center,
                 radius=self.radius, depth=np.int32(self.depth),
                 data_format=np.str_(self.data_format))

    @staticmethod
    def load(path) -> "Octree":
        z = np.load(path, allow_pickle=False)
        return Octree(child=z["child"], data=z["data"], center=z["center"],
                      radius=z["radius"], depth=int(z["depth"]),
                      data_format=str(z["data_format"]))

    def query(self, pts: np.ndarray) -> np.ndarray:
        """Nearest-leaf payload lookup for [N, 3] world points (zeros for
        empty space)."""
        n = pts.shape[0]
        out = np.zeros((n, self.data.shape[1]), np.float32)
        # normalized [0, 1) cube coords
        u = (pts - (self.center - self.radius)) / (2 * self.radius)
        valid = np.all((u >= 0) & (u < 1), axis=1)
        idx = np.where(valid)[0]
        u = u[idx]
        node = np.zeros(idx.shape[0], np.int64)   # current internal node
        for _ in range(self.depth):
            u = u * 2
            cell = np.floor(u).astype(np.int64)
            u = u - cell
            code = cell[:, 0] * 4 + cell[:, 1] * 2 + cell[:, 2]
            nxt = self.child[node, code]
            leaf = nxt <= -2
            out[idx[leaf]] = self.data[-(nxt[leaf] + 2)]
            alive = nxt >= 0
            idx, u, node = idx[alive], u[alive], nxt[alive].astype(np.int64)
            if idx.size == 0:
                break
        return out


def build_octree(occupied: np.ndarray, leaf_payload: Callable,
                 center, radius, data_format: str) -> Octree:
    """occupied: [R, R, R] bool at full resolution R == 2**depth.
    leaf_payload(cells [L, 3] int) -> [L, D] payloads."""
    reso = occupied.shape[0]
    depth = int(np.log2(reso))
    assert 2 ** depth == reso

    occ_cells = np.argwhere(occupied)                       # [L, 3]
    payload = leaf_payload(occ_cells).astype(np.float32)

    # bottom-up occupancy pyramids; levels[l] has size 2**(l+1) (children
    # grid of a node at tree level l)
    levels = [occupied]
    for _ in range(depth - 1):
        o = levels[-1]
        r = o.shape[0] // 2
        o2 = o.reshape(r, 2, r, 2, r, 2).any(axis=(1, 3, 5))
        levels.append(o2)
    levels = levels[::-1]                                    # coarse -> fine

    # leaf ids at full resolution
    leaf_id = -np.ones(occupied.shape, np.int64)
    leaf_id[tuple(occ_cells.T)] = np.arange(occ_cells.shape[0])

    # allocate internal nodes top-down (breadth-first)
    child_rows = []
    # queue entries: (level, cell coords) — level 0 is the root (1 cell)
    import collections
    node_index = {(0, (0, 0, 0)): 0}
    queue = collections.deque([(0, (0, 0, 0))])
    child_rows.append(np.full(8, -1, np.int64))
    while queue:
        level, (cx, cy, cz) = queue.popleft()
        row = child_rows[node_index[(level, (cx, cy, cz))]]
        for code in range(8):
            dx, dy, dz = code >> 2 & 1, code >> 1 & 1, code & 1
            fx, fy, fz = cx * 2 + dx, cy * 2 + dy, cz * 2 + dz
            if level + 1 < depth:
                if levels[level][fx, fy, fz]:
                    child_rows.append(np.full(8, -1, np.int64))
                    nid = len(child_rows) - 1
                    node_index[(level + 1, (fx, fy, fz))] = nid
                    queue.append((level + 1, (fx, fy, fz)))
                    row[code] = nid
            else:
                lid = leaf_id[fx, fy, fz]
                if lid >= 0:
                    row[code] = -(2 + lid)
    child = np.stack(child_rows).astype(np.int32)
    return Octree(child=child, data=payload,
                  center=np.asarray(center, np.float32),
                  radius=np.asarray(radius, np.float32),
                  depth=depth, data_format=data_format)


def grid_points(center, radius, reso: int) -> np.ndarray:
    """Cell-center world coordinates [R^3, 3]."""
    center = np.asarray(center, np.float32)
    radius = np.asarray(radius, np.float32)
    arr = (np.arange(reso, dtype=np.float32) + 0.5) / reso   # (0, 1)
    axes = [center[i] - radius[i] + 2 * radius[i] * arr for i in range(3)]
    g = np.stack(np.meshgrid(*axes, indexing="ij"), -1)
    return g.reshape(-1, 3)


def sigma_threshold_from_alpha(alpha_thresh: float, reso: int) -> float:
    """alpha = 1 - exp(-sigma * delta) >= t  =>  sigma >= -ln(1-t)/delta."""
    approx_delta = 2.0 / reso
    return -np.log(1.0 - alpha_thresh) / approx_delta


def grid_weights(sigma_grid: np.ndarray, poses: np.ndarray,
                 center, radius, camera: Tuple[int, int, float, float,
                                               float, float],
                 n_steps: Optional[int] = None,
                 ray_subsample: int = 4) -> np.ndarray:
    """Max volume-rendering weight each grid cell receives over the cameras
    (reference _calculate_grid_weights via svox grid_weight_render).

    sigma_grid: [R, R, R]; poses: [P, 3, 4] c2w; camera (W, H, fx, fy, cx,
    cy). Pure numpy ray marching at grid resolution; rays subsampled by
    `ray_subsample` in each image dimension for tractability.
    """
    reso = sigma_grid.shape[0]
    w, h, fx, fy, cx, cy = camera
    # the march window spans 2 grid diagonals (see t_entry below), so 4*R
    # steps keep the step length at half a cell — every cell on the ray
    # gets sampled
    n_steps = n_steps or reso * 4
    center = np.asarray(center, np.float32)
    radius = np.asarray(radius, np.float32)
    lo = center - radius
    span = 2 * radius

    maxw = np.zeros_like(sigma_grid, np.float32)
    # same pixel-center camera convention as the data pipeline — reuse it
    # (a convention change in ray_utils must propagate here)
    from switch_nerf_tpu.datasets.ray_utils import get_ray_directions
    dirs_cam = np.asarray(get_ray_directions(
        w, h, fx, fy, cx, cy, center_pixels=True))[
            ::ray_subsample, ::ray_subsample].reshape(-1, 3)

    diag = float(np.linalg.norm(span))

    for pose in poses:
        d = dirs_cam @ pose[:, :3].T
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o = pose[:, 3]
        # march from the camera's distance to the box (cameras can stand
        # far outside the occupied bbox — a fixed [0, diag] window would
        # never reach it and every cell's weight would stay 0)
        t_entry = max(0.0, float(np.linalg.norm(o - center)) - diag)
        ts = np.linspace(t_entry + 1e-4, t_entry + 2 * diag, n_steps,
                         dtype=np.float32)
        delta = np.float32(ts[1] - ts[0])
        pts = o[None, None, :] + d[:, None, :] * ts[None, :, None]
        cell = np.floor((pts - lo) / span * reso).astype(np.int64)
        inside = np.all((cell >= 0) & (cell < reso), axis=-1)
        cc = np.clip(cell, 0, reso - 1)
        sig = sigma_grid[cc[..., 0], cc[..., 1], cc[..., 2]]
        sig = np.where(inside, sig, 0.0)
        alpha = 1.0 - np.exp(-sig * delta)
        trans = np.cumprod(1.0 - alpha + 1e-10, axis=-1)
        trans = np.concatenate(
            [np.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
        wgt = alpha * trans
        flat = (cc[..., 0] * reso + cc[..., 1]) * reso + cc[..., 2]
        np.maximum.at(maxw.reshape(-1), flat[inside], wgt[inside])
    return maxw
