"""Config-driven NeRF-MoE layer graph.

Parity target: switch_nerf/models/nerf_moe.py:103-455 (NeRFMoE) and :458-810
(MipNeRFMoE; identical graph with MipEmbedder over (mean, diag-cov) inputs —
unified here behind `use_mip`).

The network is defined by a YAML-typed layer dict (`--model` flag,
opts.py:121-124): tag "xyz" is the PE->hidden stem, numbered tags 0..N-1 are
the main trunk (types mlp/moe/normmlp/layernorm), "sigma"/"color" are the
heads, and optional "moe_external_gate" (small MLP over the stem features)
and "gate_input_norm" (LayerNorm) feed the MoE gate. The trunk walk taps
sigma at `sigma_tag` (fp32-forced unless bf16-AMP, nerf_moe.py:396-400),
injects viewdir PE + appearance embedding at `dir_tag`, and produces rgb at
`color_tag`.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from switch_nerf_tpu.models.common import TorchLinear, apply_act, OneHotEmbed
from switch_nerf_tpu.models.mlp import Mlp, NormMlp
from switch_nerf_tpu.models.moe import MoELayer
from switch_nerf_tpu.ops.encoding import freq_encode, mip_encode, shifted_softplus


class NeRFMoE(nn.Module):
    layer_cfg: Dict[str, Any]                # the YAML "model" dict
    pos_xyz_dim: int = 12
    pos_dir_dim: int = 4
    appearance_dim: int = 48
    affine_appearance: bool = False
    appearance_count: int = 0
    rgb_dim: int = 3
    xyz_dim: int = 3
    shifted_softplus_sigma: bool = True
    use_mip: bool = False
    # moe hyper-params shared by every moe tag (from CLI flags)
    moe_capacity_factor: float = 1.0
    batch_prioritized_routing: bool = False
    gate_noise: float = -1.0
    use_load_importance_loss: bool = False
    compute_balance_loss: bool = False
    dispatcher_no_score: bool = False
    is_postscore: bool = True
    use_moe_external_gate: bool = False
    use_gate_input_norm: bool = False
    moe_use_residual: bool = False
    moe_return_gates: bool = False
    moe_return_gate_logits: bool = False
    train_dispatch: str = "padded"
    eval_dispatch: str = "padded"
    moe_expert_type: str = "expertmlp"
    sigma_fp32: bool = True                  # False under bf16 AMP (amp_use_bfloat16)
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    expert_axis: Optional[str] = None
    ep_size: int = 1
    shard_experts_spmd: bool = False

    def _build_layer(self, tag: str):
        cfg = self.layer_cfg["layers"][tag]
        typ = cfg["type"]
        if typ == "mlp":
            return Mlp(hidden_features=cfg["h_ch"], out_features=cfg["out_ch"],
                       layer_num=cfg["num"], skips=cfg.get("skips"),
                       param_dtype=self.param_dtype, name=f"layer_{tag}")
        if typ == "normmlp":
            return NormMlp(hidden_features=cfg["h_ch"], out_features=cfg["out_ch"],
                           layer_num=cfg["num"], skips=cfg.get("skips"),
                           norm_name=cfg.get("norm_name", "none"),
                           param_dtype=self.param_dtype, name=f"layer_{tag}")
        if typ == "moe":
            assert cfg["in_ch"] == cfg["out_ch"]
            return MoELayer(
                model_dim=cfg["in_ch"],
                num_experts=cfg.get("expert_num", self.layer_cfg.get("expert_num", 8)),
                layer_num=cfg["num"],
                skips=cfg.get("skips"),
                init_factor=cfg.get("init_factor", 1.0),
                top_k=cfg.get("k", 1),
                capacity_factor=self.moe_capacity_factor,
                batch_prioritized_routing=self.batch_prioritized_routing,
                fp32_gate=cfg.get("fp32_gate", True),
                gate_dim=cfg.get("gate_dim"),
                gate_noise=self.gate_noise,
                use_load_importance_loss=self.use_load_importance_loss,
                compute_balance_loss=self.compute_balance_loss,
                is_postscore=self.is_postscore,
                no_score=self.dispatcher_no_score,
                use_residual=self.moe_use_residual,
                return_gates=self.moe_return_gates,
                return_gate_logits=self.moe_return_gate_logits,
                train_dispatch=self.train_dispatch,
                eval_dispatch=self.eval_dispatch,
                expert_type=self.moe_expert_type,
                ffn_hidden_size=cfg.get("h_ch", 0),
                param_dtype=self.param_dtype,
                expert_axis=self.expert_axis,
                ep_size=self.ep_size,
                shard_experts_spmd=self.shard_experts_spmd,
                name=f"layer_{tag}")
        if typ == "layernorm":
            # epsilon matches torch nn.LayerNorm's 1e-5 (flax default 1e-6)
            return nn.LayerNorm(epsilon=1e-5, param_dtype=self.param_dtype,
                                name=f"layer_{tag}")
        if typ == "groupnorm":
            # reference nerf_moe.py:305-307 (nn.GroupNorm(group_num, in_ch));
            # epsilon matches torch's 1e-5 (flax default is 1e-6)
            return nn.GroupNorm(num_groups=cfg["group_num"], epsilon=1e-5,
                                param_dtype=self.param_dtype,
                                name=f"layer_{tag}")
        if typ == "dropout":
            # reference nerf_moe.py:308-309 (nn.Dropout(prob), train-only)
            return nn.Dropout(rate=cfg["prob"], name=f"layer_{tag}")
        if typ == "batchnorm":
            # Scoping decision (documented in STATUS.md): unused by every
            # published config; its running-stats EMA is ill-defined under
            # the chunked lax.scan inference loop, and the reference's own
            # NormMlp batchnorm branch raises NotImplementedError
            # (nerf_moe.py:66-73).
            raise NotImplementedError(
                "graph-level batchnorm is not supported (unused by all "
                "published Switch-NeRF configs; see STATUS.md)")
        raise NotImplementedError(f"layer type {typ!r}")

    @nn.compact
    def __call__(self, x, sigma_noise: Optional[jnp.ndarray] = None,
                 sigma_only: bool = False, *, deterministic: bool = True):
        cfgs = self.layer_cfg["layers"]
        layer_num_main = self.layer_cfg["layer_num_main"]
        sigma_tag = str(self.layer_cfg["sigma_tag"])
        dir_tag = str(self.layer_cfg["dir_tag"])
        color_tag = str(self.layer_cfg["color_tag"])

        xd = self.xyz_dim * (2 if self.use_mip else 1)
        has_dir = self.pos_dir_dim > 0
        has_app = self.appearance_dim > 0

        # static input-width validation (reference nerf_moe.py:324-326
        # 'Unexpected input shape'): without it, a missing appearance
        # column would silently feed x[:, -1] (a viewdir component) into
        # the embedding lookup
        expected = xd + (3 if (has_dir and not sigma_only) else 0) \
            + (1 if (has_app and not sigma_only) else 0)
        if x.shape[-1] != expected:
            raise ValueError(
                f"Unexpected input shape {x.shape}: expected last dim "
                f"{expected} = xyz({xd})"
                + (" + dir(3)" if has_dir else "")
                + (" + appearance(1)" if has_app else ""))

        xin = x[:, :xd].astype(self.compute_dtype)
        if self.use_mip:
            input_xyz = mip_encode(xin, self.pos_xyz_dim, input_dims=self.xyz_dim)
        else:
            input_xyz = freq_encode(xin, self.pos_xyz_dim)

        h = self._build_layer("xyz")(input_xyz)
        h = apply_act(cfgs["xyz"].get("act", "none"), h)
        xyz_h = h

        gate_feat = None
        if self.use_moe_external_gate:
            gate_feat = self._build_layer("moe_external_gate")(xyz_h)
            gate_feat = apply_act(cfgs["moe_external_gate"].get("act", "none"),
                                  gate_feat)
            if self.use_gate_input_norm:
                gate_feat = self._build_layer("gate_input_norm")(gate_feat)
            # named remat-save hook (off by default): the external-gate
            # features feed EVERY MoE layer's gate, so the default policy
            # recomputes the 2-layer gate MLP once in the backward;
            # A/B via SWITCH_NERF_REMAT_SAVE=+gate_feat
            from jax.ad_checkpoint import checkpoint_name
            gate_feat = checkpoint_name(gate_feat, "gate_feat")

        moe_loss = []
        moe_gates = []
        moe_gate_logits = []
        outputs = None
        sigma = None

        for i in range(layer_num_main):
            tag = str(i)
            cfg = cfgs[tag]
            layer = self._build_layer(tag)
            if cfg["type"] == "moe":
                h, l_aux, gate_extras = layer(h, gate_input=gate_feat,
                                              deterministic=deterministic)
                moe_loss.append(l_aux)
                if self.moe_return_gates:
                    moe_gates.append(gate_extras["gates"])
                if self.moe_return_gate_logits:
                    moe_gate_logits.append(gate_extras["gate_logits"])
            elif cfg["type"] == "dropout":
                h = layer(h, deterministic=deterministic)
            else:
                h = layer(h)
            h = apply_act(cfg.get("act", "none"), h)

            if tag == sigma_tag:
                sig_in = h.astype(jnp.float32) if self.sigma_fp32 else h
                sigma = Mlp(hidden_features=cfgs["sigma"]["h_ch"],
                            out_features=cfgs["sigma"]["out_ch"],
                            layer_num=cfgs["sigma"]["num"],
                            skips=cfgs["sigma"].get("skips"),
                            param_dtype=self.param_dtype, name="layer_sigma")(sig_in)
                if not has_dir:
                    # sigma head emits rgb(3)+sigma(1) (nerf_moe.py:402-412)
                    rgb, sigma = sigma[:, :3], sigma[:, 3:]
                    if self.rgb_dim == 3:
                        rgb = nn.sigmoid(rgb)
                    if sigma_noise is not None:
                        sigma = sigma + sigma_noise.astype(sigma.dtype)
                    sigma = self._sigma_act(sigma)
                    outputs = jnp.concatenate([rgb, sigma.astype(rgb.dtype)], -1)
                    break
                if sigma_noise is not None:
                    sigma = sigma + sigma_noise.astype(sigma.dtype)
                sigma = self._sigma_act(sigma)
                if sigma_only:
                    # density-only query (octree extraction / distillation;
                    # reference returns sigma right after the tap)
                    outputs = sigma
                    break

            if tag == dir_tag and has_dir:
                parts = [h]
                parts.append(freq_encode(
                    x[:, xd:xd + 3].astype(self.compute_dtype), self.pos_dir_dim))
                if has_app and not self.affine_appearance:
                    emb = OneHotEmbed(self.appearance_count, self.appearance_dim,
                                   param_dtype=self.param_dtype, name="embedding_a")
                    parts.append(emb(x[:, -1].astype(jnp.int32))
                                 .astype(self.compute_dtype))
                h = jnp.concatenate(parts, axis=-1)

            if tag == color_tag and has_dir:
                rgb = Mlp(hidden_features=cfgs["color"]["h_ch"],
                          out_features=cfgs["color"]["out_ch"],
                          layer_num=cfgs["color"]["num"],
                          skips=cfgs["color"].get("skips"),
                          param_dtype=self.param_dtype, name="layer_color")(h)
                if self.affine_appearance and has_app:
                    emb = OneHotEmbed(self.appearance_count, self.appearance_dim,
                                   param_dtype=self.param_dtype, name="embedding_a")
                    a = emb(x[:, -1].astype(jnp.int32)).astype(self.compute_dtype)
                    affine = TorchLinear(12, param_dtype=self.param_dtype,
                                         name="affine")(a).reshape(-1, 3, 4)
                    rgb = jnp.einsum("sij,sj->si", affine[:, :, :3], rgb) + affine[:, :, 3]
                if self.rgb_dim == 3:
                    rgb = nn.sigmoid(rgb)
                outputs = jnp.concatenate([rgb, sigma.astype(rgb.dtype)], -1)
                break

        extras = {}
        if self.moe_return_gates:
            extras["moe_gates"] = moe_gates
        if self.moe_return_gate_logits and moe_gate_logits:
            extras["moe_gate_logits"] = moe_gate_logits
        if moe_loss:
            extras["moe_loss"] = jnp.stack(moe_loss)
        return {"outputs": outputs, "extras": extras}

    def _sigma_act(self, sigma):
        return shifted_softplus(sigma) if self.shifted_softplus_sigma else nn.relu(sigma)


def MipNeRFMoE(**kwargs):
    """Mip variant: MipEmbedder IPE over (mean, diag-cov); parity with
    switch_nerf/models/nerf_moe.py:458-810."""
    return NeRFMoE(use_mip=True, **kwargs)
