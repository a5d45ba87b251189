"""Plain / normalized MLP blocks with the reference's skip semantics.

Parity targets: switch_nerf/models/nerf_moe.py:16-49 (Mlp), :51-101 (NormMlp).

Skip semantics (identical to the reference): at a skip layer, h += x BEFORE
the activation, and x is rebound to the post-skip h; the final layer never
applies the activation.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from switch_nerf_tpu.models.common import TorchLinear, apply_act


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    layer_num: int
    skips: Optional[Sequence[int]] = None
    act: str = "relu"
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        skips = set(self.skips or ())
        h = x
        for i in range(self.layer_num):
            out_ch = self.out_features if i == self.layer_num - 1 else self.hidden_features
            h = TorchLinear(out_ch, param_dtype=self.param_dtype, name=f"fc{i}")(h)
            if i in skips:
                h = h + x
                if i < self.layer_num - 1:
                    h = apply_act(self.act, h)
                x = h
            elif i < self.layer_num - 1:
                h = apply_act(self.act, h)
        return h


class NormMlp(nn.Module):
    hidden_features: int
    out_features: int
    layer_num: int
    skips: Optional[Sequence[int]] = None
    act: str = "relu"
    norm_name: str = "none"
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        skips = set(self.skips or ())
        use_norm = self.norm_name != "none"
        if use_norm and self.norm_name != "layernorm":
            raise NotImplementedError(self.norm_name)
        h = x
        for i in range(self.layer_num):
            out_ch = self.out_features if i == self.layer_num - 1 else self.hidden_features
            h = TorchLinear(out_ch, param_dtype=self.param_dtype, name=f"fc{i}")(h)
            is_last = i == self.layer_num - 1
            if i in skips:
                h = h + x
                if not is_last:
                    if use_norm:
                        h = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype, name=f"norm{i}")(h)
                    h = apply_act(self.act, h)
                x = h
            elif not is_last:
                if use_norm:
                    h = nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype, name=f"norm{i}")(h)
                h = apply_act(self.act, h)
        return h
