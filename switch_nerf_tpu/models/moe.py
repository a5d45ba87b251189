"""Switch-gated Mixture-of-Experts layer (top-k, capacity-factor dispatch).

Parity targets:
  * MOELayer.forward / TopKGate.apply_on_expert_fn —
    switch_nerf/modules/tutel_moe_ext/tutel_moe_layer_nobatch.py:98-235, 733-797
  * fp32 gate under mixed precision — :105-113 (wg.float() + autocast off)
  * gate noise — :118-121; normal noise — :115-116
  * dispatch dtype fp32 for non-fp16 inputs — tutel_fast_dispatch.py:106-114
  * batched capacity-padded path ("--moe_train_batch", the published training
    configuration, README.md:71-75) — `dispatch_mode="padded"`
  * "nobatch" variable-size no-drop path (default when the batch flags are
    absent; tutel_fast_dispatch_nobatch.py) — `dispatch_mode="nodrop"`,
    realised with static shapes as sort-by-expert + jax.lax.ragged_dot
    grouped GEMMs (no tokens dropped, identical numerics).
  * residual MoE — tutel_moe_layer_nobatch.py:778-788

Expert parallelism: when `expert_axis` is set (inside shard_map over a mesh
axis of size ep_size), the [E, C, M] dispatch buffer is exchanged with
jax.lax.all_to_all over ICI — the XLA-native replacement for Tutel's NCCL
all_to_all_single (tutel_moe_layer_nobatch.py:172,185). Expert params are
sharded over that axis outside; the module sees the local [E/ep, ...] slice.
EP requires the padded mode (the reference's EP nobatch path exchanges
variable splits, runner default keeps EP off; SURVEY.md §2.7).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from switch_nerf_tpu.models.common import TorchLinear
from switch_nerf_tpu.models.experts import ExpertMLP
from switch_nerf_tpu.ops.routing import extract_critical, load_importance_loss
from switch_nerf_tpu.ops.dispatch import build_dispatch_plan, dispatch, combine


class MoELayer(nn.Module):
    model_dim: int
    num_experts: int                         # global expert count E
    layer_num: int = 1
    skips: Optional[Sequence[int]] = None
    init_factor: float = 1.0
    top_k: int = 1
    capacity_factor: float = 1.0
    batch_prioritized_routing: bool = False
    fp32_gate: bool = True
    gate_dim: Optional[int] = None
    gate_noise: float = -1.0
    use_normal_noise: bool = False
    use_load_importance_loss: bool = False
    compute_balance_loss: bool = False
    is_postscore: bool = True
    no_score: bool = False
    use_residual: bool = False
    return_gates: bool = False
    return_gate_logits: bool = False
    train_dispatch: str = "padded"           # "padded" | "nodrop"
    eval_dispatch: str = "padded"
    expert_type: str = "expertmlp"           # "expertmlp" | "ffn"
    ffn_hidden_size: int = 0                 # ffn expert hidden width
    param_dtype: jnp.dtype = jnp.float32
    # expert parallelism
    expert_axis: Optional[str] = None        # manual shard_map all_to_all path
    ep_size: int = 1
    shard_experts_spmd: bool = False         # GSPMD path: constrain the
    # [E, C, M] dispatch buffer to P('expert') so the XLA partitioner places
    # the token exchange as an ICI all-to-all (auto analog of Tutel's
    # all_to_all_single, tutel_moe_layer_nobatch.py:172,185)

    @nn.compact
    def __call__(self, x, gate_input=None, *, deterministic: bool = True):
        """x: [S, M]; gate_input: [S, gate_dim] or None.

        Returns (y [S, M], l_aux scalar fp32, extras dict).
        """
        s, m = x.shape
        e = self.num_experts
        assert m == self.model_dim

        # debug escape hatch (reference env toggles SKIP_MOE / SKIP_EXPERT,
        # tutel_moe_layer_nobatch.py:78-96): bypass the MoE entirely
        import os
        if os.environ.get("SKIP_MOE"):
            return x, jnp.zeros((), jnp.float32), {}

        # ---- gate (fp32) -------------------------------------------------
        gin = gate_input if gate_input is not None else x
        gdtype = jnp.float32 if self.fp32_gate else x.dtype
        wg = TorchLinear(e, use_bias=False, param_dtype=jnp.float32, name="wg")
        logits = wg(gin.astype(gdtype))

        if self.use_normal_noise and not deterministic:
            rng = self.make_rng("gate_noise")
            logits = logits + jax.random.normal(rng, logits.shape, logits.dtype) / e

        if self.gate_noise > 0 and not deterministic:
            rng = self.make_rng("gate_noise")
            logits_w_noise = logits + self.gate_noise * jax.random.normal(
                rng, logits.shape, logits.dtype) / e
        else:
            logits_w_noise = logits

        gates = jax.nn.softmax(logits_w_noise.astype(jnp.float32), axis=1)

        extras = {}
        if self.use_load_importance_loss:
            # extract_critical's second return IS the load-balance value
            # (same gates + top-1 mask) — reuse it instead of rebuilding
            plan, balance = extract_critical(
                gates, self.top_k, self.capacity_factor,
                self.batch_prioritized_routing)
            gates_wo_noise = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
            # plan.indices already holds the top-k expert ids ([K, S])
            topk_logits = jnp.take_along_axis(
                logits_w_noise.astype(jnp.float32),
                jnp.transpose(plan.indices), axis=1)
            l_aux = load_importance_loss(gates_wo_noise, topk_logits, e,
                                         self.gate_noise)
            if self.compute_balance_loss:
                extras["balance_loss"] = balance
        else:
            plan, l_aux = extract_critical(gates, self.top_k, self.capacity_factor,
                                           self.batch_prioritized_routing)

        mode = self.eval_dispatch if deterministic else self.train_dispatch
        if self.expert_type == "ffn":
            from switch_nerf_tpu.models.experts import FusedFFNExperts
            experts = FusedFFNExperts(
                model_dim=m, num_experts=e // self.ep_size,
                hidden_size=self.ffn_hidden_size or m,
                param_dtype=self.param_dtype, name="experts")
        else:
            experts = ExpertMLP(model_dim=m, num_experts=e // self.ep_size,
                                layer_num=self.layer_num, skips=self.skips,
                                init_factor=self.init_factor,
                                param_dtype=self.param_dtype, name="experts")

        if mode == "nodrop":
            y = self._nodrop_path(x, plan, experts)
        else:
            y = self._padded_path(x, plan, experts)
        y = y.astype(x.dtype)

        # ---- residual MoE (DeepSpeed-style) -------------------------------
        if self.use_residual:
            res = ExpertMLP(model_dim=m, num_experts=1, layer_num=self.layer_num,
                            skips=self.skips, init_factor=self.init_factor,
                            param_dtype=self.param_dtype,
                            name="residual_expert")(x[None])[0]
            coef = TorchLinear(2, param_dtype=jnp.float32, name="coefficient")(
                x.astype(jnp.float32))
            coef = jax.nn.softmax(coef, axis=-1).astype(x.dtype)
            y = y * coef[..., 0:1] + res * coef[..., 1:]

        if self.return_gates:
            # routing plan already computed the top-k ids ([K, S])
            extras["gates"] = jnp.transpose(plan.indices)          # [S, K]
        if self.return_gate_logits:
            extras["gate_logits"] = logits

        return y, l_aux, extras

    def _padded_path(self, x, plan, experts):
        e, m = self.num_experts, self.model_dim
        dp = build_dispatch_plan(plan, e)

        if self._use_fused_dispatch(x, dp, experts):
            # fold the dispatch gather into the expert-chain kernel: the
            # [E, C, M] buffer never exists in HBM on the forward and the
            # backward re-gathers in VMEM (ops/fused_dispatch; measured
            # +8.1% on the fused region standalone)
            s = x.shape[0]
            pad_rows = (-(s + 1)) % 8
            tokens_ext = jnp.concatenate(
                [x, jnp.zeros((1 + pad_rows, m), x.dtype)], axis=0)
            stt_eff = jnp.where(dp.filled[0], dp.slot_to_token[0],
                                s).astype(jnp.int32)
            slot_ext = jnp.concatenate(
                [dp.slot[0],
                 jnp.full((1 + pad_rows,), e * dp.capacity, jnp.int32)])
            kept_ext = jnp.concatenate(
                [dp.kept[0], jnp.zeros((1 + pad_rows,), bool)])
            expert_out = experts.fused_dispatch(tokens_ext, stt_eff,
                                                slot_ext, kept_ext)
            return combine(expert_out, dp, is_postscore=self.is_postscore,
                           no_score=self.no_score)

        dispatched = dispatch(x, dp, is_postscore=self.is_postscore,
                              no_score=self.no_score)            # [E, C, M]
        from jax.ad_checkpoint import checkpoint_name
        dispatched = checkpoint_name(dispatched, "moe_dispatched")

        if self.shard_experts_spmd:
            from switch_nerf_tpu.parallel.mesh import shard_constraint, EXPERT_AXIS
            from jax.sharding import PartitionSpec as P
            dispatched = shard_constraint(dispatched, P(EXPERT_AXIS))
            expert_out = experts(dispatched)
            expert_out = shard_constraint(expert_out, P(EXPERT_AXIS))
        elif self.expert_axis is not None and self.ep_size > 1:
            ep = self.ep_size
            e_local = e // ep
            cap = dispatched.shape[1]
            # exchange: every device sends expert block d to device d.
            z = jax.lax.all_to_all(dispatched, self.expert_axis,
                                   split_axis=0, concat_axis=0, tiled=True)
            # rows are (src_device, local_expert): [ep, E_local, C, M]
            z = z.reshape(ep, e_local, cap, m).transpose(1, 0, 2, 3)
            z = z.reshape(e_local, ep * cap, m)
            y = experts(z)
            y = y.reshape(e_local, ep, cap, m).transpose(1, 0, 2, 3)
            y = y.reshape(e, cap, m)
            expert_out = jax.lax.all_to_all(y, self.expert_axis,
                                            split_axis=0, concat_axis=0,
                                            tiled=True)
        else:
            expert_out = experts(dispatched)

        # combine gathers in the expert-output dtype (bf16 under AMP) and
        # accumulates the gate multiply in fp32 internally
        return combine(expert_out, dp, is_postscore=self.is_postscore,
                       no_score=self.no_score)

    def _use_fused_dispatch(self, x, dp, experts) -> bool:
        """Opt-in (SWITCH_NERF_FUSED_DISPATCH=1) fused dispatch+chain:
        top-1 postscore/no_score expertmlp without EP, at shapes where the
        resident token array fits VMEM (ops/fused_dispatch)."""
        import os
        from switch_nerf_tpu.ops.fused_dispatch import fused_supported
        if os.environ.get("SWITCH_NERF_FUSED_DISPATCH", "0") != "1":
            return False
        return (self.top_k == 1
                and (self.is_postscore or self.no_score)
                and isinstance(experts, ExpertMLP)
                and self.expert_axis is None
                and not self.shard_experts_spmd
                and fused_supported(x.shape, dp.num_experts, dp.capacity,
                                    self.layer_num))

    def _nodrop_path(self, x, plan, experts):
        """Sort-by-expert + ragged grouped GEMM; zero token drops.

        Numerically equivalent to the reference nobatch dispatcher
        (tutel_fast_dispatch_nobatch.py:16-158): every (k, token) pair is
        processed by its expert; gate multiply on combine (postscore) or
        dispatch (prescore).
        """
        if self.expert_axis is not None and self.ep_size > 1:
            raise NotImplementedError("EP requires dispatch mode 'padded'")
        from switch_nerf_tpu.ops.sorting import sort_with_payloads

        k, s = plan.indices.shape
        flat_expert = plan.indices.reshape(-1).astype(jnp.int32)  # [K*S]
        gates_flat = plan.gates.reshape(-1).astype(jnp.float32)   # [K*S]
        iota = jnp.arange(k * s, dtype=jnp.int32)

        # ONE multi-operand sort groups rows by expert and carries the
        # original row id + gate along (sorting networks on the VPU; the
        # argsort+fancy-index chain this replaces lowered to the
        # dynamic-gather fusions CLAUDE.md flags as the TPU killer)
        # the sort's first result IS flat_expert[order] (stable sort) — use
        # it directly instead of re-gathering
        row_expert, order, sorted_gates = sort_with_payloads(flat_expert,
                                                             iota, gates_flat)
        row_token = order % s
        # per-expert counts: the routing plan already computed the
        # k-aggregated one-hot reduction (routing.py:extract_critical)
        counts = plan.expert_counts

        xs = x[row_token]                                         # [K*S, M]
        if not (self.is_postscore or self.no_score):
            xs = xs * sorted_gates[:, None].astype(xs.dtype)

        ys = experts.ragged(xs, counts, row_expert)               # [K*S, M]

        # inverse permutation via a second payload sort (not argsort);
        # gather rows in their NATIVE dtype (half the bytes under bf16 on
        # the gather-bandwidth-bound path), cast for the fp32 combine after
        _, inv = sort_with_payloads(order, iota)
        rows = ys[inv].astype(jnp.float32).reshape(k, s, -1)
        scale = jnp.ones_like(plan.gates) if (self.no_score or not self.is_postscore) \
            else plan.gates
        return jnp.sum(rows * scale[..., None], axis=0)
