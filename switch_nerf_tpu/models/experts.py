"""Stacked expert MLPs — the FLOP core of the MoE layer.

Parity target: ExpertMLP, switch_nerf/modules/tutel_moe_ext/
tutel_moe_layer_nobatch.py:837-924 (per-layer `torch.baddbmm` over stacked
[E, M, M] weights with mid-skip connections).

TPU-first: two execution forms over the same parameters:
  * padded  [E, C, M]: one batched einsum `ecm,emn->ecn` per layer — E large
    GEMMs tiling perfectly onto the MXU (capacity-factor dispatch).
  * ragged  [N, M] + group_sizes [E]: jax.lax.ragged_dot per layer — the
    exact-shape grouped GEMM used for the reference's "nobatch" no-drop mode
    (tutel_fast_dispatch_nobatch.py variable-size dispatch) without dynamic
    shapes.
Compute runs in the caller's dtype (bf16 under mixed precision) with fp32
accumulation; params are fp32.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from switch_nerf_tpu.models.common import torch_linear_kernel_init, torch_linear_bias_init


class ExpertMLP(nn.Module):
    model_dim: int
    num_experts: int                 # local expert count (== global unless EP)
    layer_num: int
    skips: Optional[Sequence[int]] = None
    init_factor: float = 1.0
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        m = self.model_dim
        kinit = torch_linear_kernel_init()
        binit = torch_linear_bias_init(m)
        f = self.init_factor
        ws, bs = [], []
        for layer_id in range(self.layer_num):
            ws.append(self.param(
                f"w{layer_id}",
                lambda k, s, d=self.param_dtype: kinit(k, s, d) * f,
                (self.num_experts, m, m), self.param_dtype))
            bs.append(self.param(
                f"b{layer_id}",
                lambda k, s, d=self.param_dtype: binit(k, s, d) * f,
                (self.num_experts, 1, m), self.param_dtype))
        self.ws = ws
        self.bs = bs

    def _skip_act(self, layer_id, h, xin):
        skips = set(self.skips or ())
        is_last = layer_id == self.layer_num - 1
        if layer_id in skips:
            h = h + xin
            if not is_last:
                h = nn.relu(h)
            xin = h
        elif not is_last:
            h = nn.relu(h)
        return h, xin

    def __call__(self, x):
        """Padded form: x [E, C, M] -> [E, C, M]."""
        h = x
        xin = x
        for layer_id in range(self.layer_num):
            w = self.ws[layer_id].astype(h.dtype)
            b = self.bs[layer_id].astype(h.dtype)
            h = jnp.einsum("ecm,emn->ecn", h, w,
                           preferred_element_type=jnp.float32).astype(h.dtype)
            h = h + b
            h, xin = self._skip_act(layer_id, h, xin)
        return h

    def ragged(self, x, group_sizes, row_expert):
        """Ragged form: x [N, M] sorted by expert; group_sizes [E] int32;
        row_expert [N] int32 (expert id per row, for bias/broadcast)."""
        h = x
        xin = x
        for layer_id in range(self.layer_num):
            w = self.ws[layer_id].astype(h.dtype)
            b = self.bs[layer_id][:, 0, :].astype(h.dtype)      # [E, M]
            h = jax.lax.ragged_dot(
                h, w, group_sizes,
                preferred_element_type=jnp.float32).astype(h.dtype)
            h = h + b[row_expert]
            h, xin = self._skip_act(layer_id, h, xin)
        return h

    def fused_dispatch(self, tokens_ext, stt_eff, slot, kept):
        """Fused form: dispatch gather folded into the chain kernel
        (ops/fused_dispatch; top-1 padded mode) — equivalent to
        `self(dispatch(tokens))` without the HBM dispatch buffer."""
        from switch_nerf_tpu.ops.fused_dispatch import fused_dispatch_chain
        dt = tokens_ext.dtype
        ws = jnp.stack([w.astype(dt) for w in self.ws])     # [L, E, M, M]
        bs = jnp.stack([b.astype(dt) for b in self.bs])     # [L, E, 1, M]
        return fused_dispatch_chain(tokens_ext, stt_eff, ws, bs,
                                    slot, kept, tuple(self.skips or ()))


class FusedFFNExperts(nn.Module):
    """Tutel-style 2-layer fused FFN experts (moe_expert_type='ffn').

    Parity target: FusedExpertsNetwork,
    tutel_moe_layer_nobatch.py:513-642 — per-expert fc1 [M, H] -> act ->
    fc2 [H, M] as stacked batched einsums. (The reference's ZeRO
    weight-sharding hooks for num_experts < num_devices are intentionally
    absent: shard the hidden dim via the mesh if ever needed.)
    """
    model_dim: int
    num_experts: int
    hidden_size: int
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        m, h, e = self.model_dim, self.hidden_size, self.num_experts
        kinit = torch_linear_kernel_init()
        self.w1 = self.param("w1", kinit, (e, m, h), self.param_dtype)
        self.b1 = self.param("b1", torch_linear_bias_init(m),
                             (e, 1, h), self.param_dtype)
        self.w2 = self.param("w2", kinit, (e, h, m), self.param_dtype)
        self.b2 = self.param("b2", torch_linear_bias_init(h),
                             (e, 1, m), self.param_dtype)

    def __call__(self, x):
        """x [E, C, M] -> [E, C, M]."""
        h = jnp.einsum("ecm,emh->ech", x, self.w1.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        h = nn.relu(h + self.b1.astype(x.dtype))
        y = jnp.einsum("ech,ehm->ecm", h, self.w2.astype(x.dtype),
                       preferred_element_type=jnp.float32).astype(x.dtype)
        return y + self.b2.astype(x.dtype)

    def ragged(self, x, group_sizes, row_expert):
        h = jax.lax.ragged_dot(
            x, self.w1.astype(x.dtype), group_sizes,
            preferred_element_type=jnp.float32).astype(x.dtype)
        h = nn.relu(h + self.b1[:, 0, :].astype(x.dtype)[row_expert])
        y = jax.lax.ragged_dot(
            h, self.w2.astype(x.dtype), group_sizes,
            preferred_element_type=jnp.float32).astype(x.dtype)
        return y + self.b2[:, 0, :].astype(x.dtype)[row_expert]
