"""Dependency-free mask-based MoE — the numerics oracle.

Parity target: switch_nerf/modules/tutel_moe_ext/torch_moe_layer_nobatch.py
:73-172 (the pure-torch reference MoE used via nerfmoe_class_name=
"NeRFMoETorch" and as ground truth for the dispatcher numerics): gate
softmax -> top-1 argmax -> per-expert masked forward -> gate-score multiply.

The torch version gathers each expert's tokens with boolean masks
(data-dependent shapes); here every expert runs on the full token set and
the one-hot mask selects outputs — bitwise-identical results with static
shapes. O(E x S x M) compute: an ORACLE for tests and debugging, not a
production path (MoELayer is).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from switch_nerf_tpu.models.common import TorchLinear
from switch_nerf_tpu.models.experts import ExpertMLP
from switch_nerf_tpu.ops.routing import load_balance


class MaskedMoELayer(nn.Module):
    """Top-1 switch MoE with dense masked dispatch (no drops)."""
    model_dim: int
    num_experts: int
    layer_num: int = 1
    skips: Optional[Sequence[int]] = None
    init_factor: float = 1.0
    fp32_gate: bool = True
    gate_dim: Optional[int] = None
    is_postscore: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, gate_input=None, *, deterministic: bool = True):
        s, m = x.shape
        e = self.num_experts
        gin = gate_input if gate_input is not None else x
        gdtype = jnp.float32 if self.fp32_gate else x.dtype
        logits = TorchLinear(e, use_bias=False, param_dtype=jnp.float32,
                             name="wg")(gin.astype(gdtype))
        gates = jax.nn.softmax(logits.astype(jnp.float32), axis=1)

        top1 = jnp.argmax(gates, axis=1)                        # [S]
        mask = jax.nn.one_hot(top1, e, dtype=jnp.float32)       # [S, E]
        score = jnp.max(gates, axis=1, keepdims=True)           # [S, 1]
        l_aux = load_balance(gates, mask, e)

        experts = ExpertMLP(model_dim=m, num_experts=e,
                            layer_num=self.layer_num, skips=self.skips,
                            init_factor=self.init_factor,
                            param_dtype=self.param_dtype, name="experts")
        xin = x if self.is_postscore else x * score.astype(x.dtype)
        # every expert on every token; one-hot select (torch boolean-mask
        # equivalent with static shapes)
        y_all = experts(jnp.broadcast_to(xin, (e, s, m)))       # [E, S, M]
        y = jnp.einsum("esm,se->sm", y_all.astype(jnp.float32), mask)
        if self.is_postscore:
            y = y * score
        return y.astype(x.dtype), l_aux, {}
