"""Model factories: hparams -> Flax module.

Parity target: switch_nerf/models/model_utils.py:69-169 (get_nerf /
get_bg_nerf / _get_nerf_inner / _get_single_nerf_inner) and
switch_nerf/models/nerf_moe.py:1004-1041 (get_nerf_moe_inner).

Differences from the reference:
  * checkpoint loading is NOT done here — JAX params are pure data; the
    runner restores them via switch_nerf_tpu.checkpoints (the
    expertmlp->seqexperts eval-format migration of model_utils.py:12-67 is
    unnecessary: our stacked [E, in, out] expert params serve both training
    and eval, sliced per-expert on demand).
  * TorchScript container loading (container_path) is replaced by our own
    checkpoint format; Cascade / MegaNeRF are native modules.
"""
from __future__ import annotations

from argparse import Namespace
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from switch_nerf_tpu.models.nerf import NeRF
from switch_nerf_tpu.models.nerf_moe import NeRFMoE


def _compute_dtype(hparams) -> jnp.dtype:
    # bf16 "AMP": the TPU-native reading of --amp/--amp_use_bfloat16. fp16
    # GradScaler machinery is unnecessary on TPU (bf16 has fp32 exponent
    # range), so amp => bfloat16 compute with fp32 params/gate/sigma.
    if getattr(hparams, "amp", False):
        return jnp.bfloat16
    return jnp.float32


_APPLY_FN_TO_DISPATCH = {
    # the reference selects the gate's dispatch strategy METHOD by name
    # (--apply_on_expert_fn_name, opts.py:258-259; resolved at
    # tutel_moe_layer_nobatch.py:768-770). The three strategies map onto
    # our two dispatch formulations; the pure-torch mask loop is
    # numerically identical to the nobatch path (it exists there as a
    # kernel-free oracle), so it selects nodrop here.
    "apply_on_expert_fn": "padded",
    "apply_on_expert_fn_nobatch": "nodrop",
    "apply_on_expert_fn_nobatch_torch": "nodrop",
}


def _dispatch_mode(hparams, batch_flag: bool) -> str:
    """Dispatch mode for one phase: --apply_on_expert_fn_name (when set)
    overrides the moe_{train,test}_batch-derived choice, exactly like the
    reference's forward-time strategy override."""
    name = getattr(hparams, "apply_on_expert_fn_name", None)
    if name is not None:
        if name not in _APPLY_FN_TO_DISPATCH:
            raise ValueError(
                f"--apply_on_expert_fn_name {name!r} unknown; expected one"
                f" of {sorted(_APPLY_FN_TO_DISPATCH)}")
        return _APPLY_FN_TO_DISPATCH[name]
    return "padded" if batch_flag else "nodrop"


def get_nerf_moe_inner(hparams, appearance_count: int, xyz_dim: int = 3,
                       model_cfg_name: str = "model") -> nn.Module:
    """NeRFMoE/MipNeRFMoE from the YAML layer-graph dict
    (reference nerf_moe.py:1004-1041)."""
    layer_cfg = getattr(hparams, model_cfg_name)
    assert layer_cfg is not None, f"--{model_cfg_name} layer graph required"
    class_name = getattr(hparams, "nerfmoe_class_name", "NeRFMoE") or "NeRFMoE"
    use_mip = class_name == "MipNeRFMoE" or getattr(hparams, "use_mip", False)

    layer_cfg = dict(layer_cfg)
    layer_cfg.setdefault("expert_num", hparams.moe_expert_num)

    expert_parallel = not getattr(hparams, "no_expert_parallel", True)
    return NeRFMoE(
        layer_cfg=layer_cfg,
        pos_xyz_dim=hparams.pos_xyz_dim,
        pos_dir_dim=hparams.pos_dir_dim,
        appearance_dim=hparams.appearance_dim,
        affine_appearance=hparams.affine_appearance,
        appearance_count=appearance_count,
        rgb_dim=3 * ((hparams.sh_deg + 1) ** 2) if hparams.sh_deg is not None else 3,
        xyz_dim=xyz_dim,
        shifted_softplus_sigma=hparams.shifted_softplus,
        use_mip=use_mip,
        moe_capacity_factor=hparams.moe_capacity_factor,
        batch_prioritized_routing=hparams.batch_prioritized_routing,
        gate_noise=hparams.gate_noise,
        use_load_importance_loss=hparams.use_load_importance_loss,
        compute_balance_loss=hparams.compute_balance_loss,
        dispatcher_no_score=hparams.dispatcher_no_score,
        is_postscore=not hparams.dispatcher_no_postscore,
        use_moe_external_gate=hparams.use_moe_external_gate,
        use_gate_input_norm=hparams.use_gate_input_norm,
        moe_use_residual=hparams.moe_use_residual,
        moe_return_gates=hparams.moe_return_gates,
        moe_return_gate_logits=hparams.moe_return_gate_logits,
        train_dispatch=_dispatch_mode(hparams, hparams.moe_train_batch),
        eval_dispatch=_dispatch_mode(hparams, hparams.moe_test_batch),
        moe_expert_type=getattr(hparams, "moe_expert_type", "expertmlp"),
        sigma_fp32=not getattr(hparams, "amp_use_bfloat16", False),
        compute_dtype=_compute_dtype(hparams),
        shard_experts_spmd=expert_parallel,
    )


def _get_single_nerf_inner(hparams, appearance_count: int, layer_dim: int,
                           xyz_dim: int) -> nn.Module:
    rgb_dim = 3 * ((hparams.sh_deg + 1) ** 2) if hparams.sh_deg is not None else 3
    return NeRF(
        pos_xyz_dim=hparams.pos_xyz_dim,
        pos_dir_dim=hparams.pos_dir_dim,
        layers=hparams.layers,
        skip_layers=tuple(hparams.skip_layers),
        layer_dim=layer_dim,
        appearance_dim=hparams.appearance_dim,
        affine_appearance=hparams.affine_appearance,
        appearance_count=appearance_count,
        rgb_dim=rgb_dim,
        xyz_dim=xyz_dim,
        shifted_softplus_sigma=hparams.shifted_softplus,
        compute_dtype=_compute_dtype(hparams),
    )


def _get_nerf_inner(hparams, appearance_count: int, layer_dim: int,
                    xyz_dim: int, model_cfg_name: str) -> nn.Module:
    if getattr(hparams, "use_cascade", False):
        from switch_nerf_tpu.models.cascade import Cascade

        def build():
            if getattr(hparams, "use_moe", False):
                return get_nerf_moe_inner(hparams, appearance_count, xyz_dim,
                                          model_cfg_name=model_cfg_name)
            return _get_single_nerf_inner(hparams, appearance_count,
                                          layer_dim, xyz_dim)
        return Cascade(coarse=build(),
                       fine=build() if hparams.fine_samples > 0 else None)
    if getattr(hparams, "use_moe", False):
        return get_nerf_moe_inner(hparams, appearance_count, xyz_dim,
                                  model_cfg_name=model_cfg_name)
    return _get_single_nerf_inner(hparams, appearance_count, layer_dim,
                                  xyz_dim)


def get_nerf(hparams, appearance_count: int) -> nn.Module:
    return _get_nerf_inner(hparams, appearance_count, hparams.layer_dim, 3,
                           "model")


def get_bg_nerf(hparams, appearance_count: int) -> nn.Module:
    """Background (inverted-sphere) NeRF: 4-dim xyz input (x', y', z', 1/r).

    Mirrors model_utils.py:74-84's use_moe swap: the bg graph comes from
    --model_bg and is MoE only when --bg_use_moe.
    """
    if getattr(hparams, "bg_use_cfg", False):
        sub = Namespace(**vars(hparams))
        sub.use_moe = hparams.bg_use_moe
        return _get_nerf_inner(sub, appearance_count, hparams.bg_layer_dim, 4,
                               "model_bg")
    sub = Namespace(**vars(hparams))
    sub.use_moe = False
    return _get_nerf_inner(sub, appearance_count, hparams.bg_layer_dim, 4,
                           "model_bg")
