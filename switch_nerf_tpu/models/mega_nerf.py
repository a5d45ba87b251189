"""Mega-NeRF spatial-cluster model: centroid-routed submodules with
boundary-margin-weighted blending.

Parity target: switch_nerf/models/mega_nerf.py:7-61. The reference gathers
points per cluster with boolean masks (data-dependent shapes); the
TPU-native formulation evaluates every submodule on the full point set and
blends with the (mostly-sparse) weight matrix — static shapes, MXU-batched,
and exact for any margin. For margin == 1 the weights degenerate to the
argmin one-hot, reproducing hard assignment.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


class MegaNeRF(nn.Module):
    sub_modules: Sequence[nn.Module]
    centroids: tuple                       # [N, 3] as nested tuples (static)
    boundary_margin: float = 1.15
    xyz_real: bool = False                 # True: first 3 cols are routing-
    # only xyz, submodules see x[:, 3:] (bg container layout)
    cluster_2d: bool = False
    joint_training: bool = False

    @nn.compact
    def __call__(self, x, sigma_noise: Optional[jnp.ndarray] = None,
                 sigma_only: bool = False, *, deterministic: bool = True):
        assert self.boundary_margin >= 1
        centroids = jnp.asarray(self.centroids, jnp.float32)
        start = 1 if self.cluster_2d else 0
        pts = x[:, start:3].astype(jnp.float32)
        d = jnp.linalg.norm(pts[:, None, :] - centroids[None, :, start:],
                            axis=-1)                         # [S, N]

        if self.boundary_margin > 1:
            inv = 1.0 / (d + 1e-8)
            min_d = jnp.min(d, axis=1, keepdims=True)
            inv = jnp.where(d > self.boundary_margin * min_d, 0.0, inv)
            weights = inv / jnp.sum(inv, axis=-1, keepdims=True)
        else:
            weights = jnp.zeros_like(d).at[
                jnp.arange(d.shape[0]), jnp.argmin(d, axis=1)].set(1.0)

        sub_in = x[:, 3:] if self.xyz_real else x
        out = None
        for i, child in enumerate(self.sub_modules):
            res = child(sub_in, sigma_noise=sigma_noise,
                        sigma_only=sigma_only, deterministic=deterministic)
            if isinstance(res, dict):
                res = res["outputs"]
            w = weights[:, i:i + 1].astype(res.dtype)
            out = res * w if out is None else out + res * w
        return out
