"""Dense (non-MoE) NeRF MLP — the Mega-NeRF architecture, used for the
background NeRF and the no-MoE baseline.

Parity target: switch_nerf/models/nerf.py:75-191 (NeRF):
  * frequency PE over xyz (first xyz_dim input channels)
  * `layers` stacked Linear+ReLU with input-concat skip connections
    (torch: xyz_ = cat([input_xyz, xyz_]) at skip layers)
  * fp-32 sigma head with additive noise before activation
  * viewdir PE + appearance embedding -> dir_a branch -> rgb head
  * affine-appearance alternative (3x4 color transform)
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from switch_nerf_tpu.models.common import TorchLinear, OneHotEmbed
from switch_nerf_tpu.ops.encoding import freq_encode, shifted_softplus


class NeRF(nn.Module):
    pos_xyz_dim: int = 12
    pos_dir_dim: int = 4
    layers: int = 8
    skip_layers: tuple = (4,)
    layer_dim: int = 256
    appearance_dim: int = 48
    affine_appearance: bool = False
    appearance_count: int = 0
    rgb_dim: int = 3
    xyz_dim: int = 3
    shifted_softplus_sigma: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    sigma_fp32: bool = True

    @nn.compact
    def __call__(self, x, sigma_noise: Optional[jnp.ndarray] = None,
                 sigma_only: bool = False, *, deterministic: bool = True):
        """x: [S, xyz_dim (+3 viewdir) (+1 appearance idx)] -> [S, rgb_dim+1]."""
        xd = self.xyz_dim
        has_dir = self.pos_dir_dim > 0
        has_app = self.appearance_dim > 0

        # static width validation (reference nerf.py:147-154): sigma-only
        # calls pass bare xyz, full calls must carry dir/appearance columns
        expected = xd + (3 if (has_dir and not sigma_only) else 0) \
            + (1 if (has_app and not sigma_only) else 0)
        if x.shape[-1] != expected:
            raise ValueError(
                f"Unexpected input shape {x.shape} (expected last dim "
                f"{expected}, xyz_dim {xd})")

        input_xyz = freq_encode(x[:, :xd].astype(self.compute_dtype), self.pos_xyz_dim)
        h = input_xyz
        for i in range(self.layers):
            if i in self.skip_layers:
                h = jnp.concatenate([input_xyz, h], axis=-1)
            h = TorchLinear(self.layer_dim, param_dtype=self.param_dtype,
                            name=f"xyz_encoding_{i}")(h)
            h = nn.relu(h)

        sigma_in = h.astype(jnp.float32) if self.sigma_fp32 else h
        sigma = TorchLinear(1, param_dtype=self.param_dtype, name="sigma")(sigma_in)
        if sigma_noise is not None:
            sigma = sigma + sigma_noise.astype(sigma.dtype)
        sigma = shifted_softplus(sigma) if self.shifted_softplus_sigma else nn.relu(sigma)

        if sigma_only:
            return sigma

        use_dir_branch = has_dir or (has_app and not self.affine_appearance)
        if use_dir_branch:
            hf = TorchLinear(self.layer_dim, param_dtype=self.param_dtype,
                             name="xyz_encoding_final")(h)
            parts = [hf]
            if has_dir:
                parts.append(freq_encode(
                    x[:, xd:xd + 3].astype(self.compute_dtype), self.pos_dir_dim))
            if has_app and not self.affine_appearance:
                emb = OneHotEmbed(self.appearance_count, self.appearance_dim,
                               param_dtype=self.param_dtype, name="embedding_a")
                parts.append(emb(x[:, -1].astype(jnp.int32)).astype(self.compute_dtype))
            h2 = jnp.concatenate(parts, axis=-1)
            h2 = nn.relu(TorchLinear(self.layer_dim // 2, param_dtype=self.param_dtype,
                                     name="dir_a_encoding")(h2))
            rgb = TorchLinear(self.rgb_dim, param_dtype=self.param_dtype, name="rgb")(h2)
        else:
            rgb = TorchLinear(self.rgb_dim, param_dtype=self.param_dtype, name="rgb")(h)

        if self.affine_appearance and has_app:
            emb = OneHotEmbed(self.appearance_count, self.appearance_dim,
                           param_dtype=self.param_dtype, name="embedding_a")
            a = emb(x[:, -1].astype(jnp.int32)).astype(self.compute_dtype)
            affine = TorchLinear(12, param_dtype=self.param_dtype, name="affine")(a)
            affine = affine.reshape(-1, 3, 4)
            rgb = (jnp.einsum("sij,sj->si", affine[:, :, :3], rgb)
                   + affine[:, :, 3])

        if self.rgb_dim == 3:
            rgb = nn.sigmoid(rgb)
        return jnp.concatenate([rgb, sigma.astype(rgb.dtype)], axis=-1)
