"""Shared initializers / numerics helpers for model modules.

Initialization matches torch.nn.Linear defaults (kaiming-uniform with
a=sqrt(5) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias),
which is what every reference module uses (e.g. nerf_moe.py Mlp,
tutel_moe_layer_nobatch.py ExpertMLP built from nn.Linear instances).
Matching the init *scale* is required for optimization parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_kernel_init(in_axis: int = -2):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for a kernel of shape [..., in, out]."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[in_axis]
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_bias_init(fan_in: int):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchLinear(nn.Module):
    """nn.Dense with torch-default init (weight AND bias fan-in bounded)."""
    features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32
    init_factor: float = 1.0

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kinit = torch_linear_kernel_init()
        if self.init_factor != 1.0:
            base = kinit
            factor = self.init_factor

            def kinit(key, shape, dtype=jnp.float32, _base=base, _f=factor):
                return _base(key, shape, dtype) * _f

        kernel = self.param("kernel", kinit, (in_features, self.features),
                            self.param_dtype)
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            binit = torch_linear_bias_init(in_features)
            if self.init_factor != 1.0:
                bbase = binit
                factor = self.init_factor

                def binit(key, shape, dtype=jnp.float32, _base=bbase, _f=factor):
                    return _base(key, shape, dtype) * _f

            bias = self.param("bias", binit, (self.features,), self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y


ACTIVATIONS = {
    "relu": nn.relu,
    "none": lambda x: x,
}


class OneHotEmbed(nn.Module):
    """nn.Embed drop-in whose backward is a matmul instead of a scatter-add.

    TPU scatter-adds into small tables are slow (profiled at ~7 ms/step for
    the appearance table); `one_hot(idx) @ table` runs forward AND backward
    on the MXU. Parameter name/shape match nn.Embed ("embedding",
    [num, features]) so checkpoints are interchangeable. Falls back to a
    plain gather forward (XLA Embed-style) above `matmul_threshold` rows.
    """
    num_embeddings: int
    features: int
    param_dtype: jnp.dtype = jnp.float32
    matmul_threshold: int = 4096

    @nn.compact
    def __call__(self, idx):
        emb = self.param(
            "embedding", nn.initializers.normal(stddev=1.0),
            (self.num_embeddings, self.features), self.param_dtype)
        if self.num_embeddings > self.matmul_threshold:
            return jnp.take(emb, idx, axis=0)
        oh = jax.nn.one_hot(idx, self.num_embeddings, dtype=emb.dtype)
        return oh @ emb


def apply_act(name: str, x):
    try:
        return ACTIVATIONS[name](x)
    except KeyError:
        raise NotImplementedError(f"activation {name!r}")
