"""Coarse/fine module pair.

Parity target: switch_nerf/models/cascade.py:7-18. The torch version
branches on `use_coarse` at call time; as a Flax module both submodules own
independent params and the renderer picks the level via the `use_coarse`
static argument (levels are separate jit traces anyway).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn


class Cascade(nn.Module):
    coarse: nn.Module
    fine: Optional[nn.Module]

    @nn.compact
    def __call__(self, x, sigma_noise: Optional[jnp.ndarray] = None,
                 sigma_only: bool = False, *, use_coarse: bool = True,
                 deterministic: bool = True):
        if self.is_initializing() and self.fine is not None:
            # materialise BOTH levels' params at init (only the selected
            # branch would be traced otherwise)
            out_c = self.coarse(x, sigma_noise=sigma_noise,
                                sigma_only=sigma_only,
                                deterministic=deterministic)
            self.fine(x, sigma_noise=sigma_noise, sigma_only=sigma_only,
                      deterministic=deterministic)
            return out_c
        if use_coarse or self.fine is None:
            return self.coarse(x, sigma_noise=sigma_noise,
                               sigma_only=sigma_only,
                               deterministic=deterministic)
        return self.fine(x, sigma_noise=sigma_noise, sigma_only=sigma_only,
                         deterministic=deterministic)
