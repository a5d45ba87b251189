"""Classic-NeRF ray helpers (OpenGL camera convention, pixel corners).

Parity target: switch_nerf/datasets/nerf_data/ray_utils.py:1-47 —
  * get_rays(H, W, K, c2w): (i-cx)/fx, -(j-cy)/fy, -1 — NOT normalized and
    NOT +0.5-centered (unlike the Mega-NeRF path); origin broadcast.
  * ndc_rays: standard NeRF NDC shift for forward-facing LLFF scenes.
"""
from __future__ import annotations

import numpy as np


def get_rays(h: int, w: int, k: np.ndarray, c2w: np.ndarray):
    """Returns (rays_o [H,W,3], rays_d [H,W,3]); directions unnormalized."""
    i, j = np.meshgrid(np.arange(w, dtype=np.float32),
                       np.arange(h, dtype=np.float32), indexing="xy")
    dirs = np.stack([(i - k[0, 2]) / k[0, 0],
                     -(j - k[1, 2]) / k[1, 1],
                     -np.ones_like(i)], axis=-1)
    rays_d = np.sum(dirs[..., None, :] * c2w[:3, :3], axis=-1)
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape).copy()
    return rays_o.astype(np.float32), rays_d.astype(np.float32)


def ndc_rays(h: int, w: int, focal: float, near: float,
             rays_o: np.ndarray, rays_d: np.ndarray):
    """Shift ray origins to the near plane and map to NDC space."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (w / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (h / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (w / (2.0 * focal)) * (rays_d[..., 0] / rays_d[..., 2]
                                       - rays_o[..., 0] / rays_o[..., 2])
    d1 = -1.0 / (h / (2.0 * focal)) * (rays_d[..., 1] / rays_d[..., 2]
                                       - rays_o[..., 1] / rays_o[..., 2])
    d2 = -2.0 * near / rays_o[..., 2]

    rays_o = np.stack([o0, o1, o2], axis=-1)
    rays_d = np.stack([d0, d1, d2], axis=-1)
    return rays_o.astype(np.float32), rays_d.astype(np.float32)
