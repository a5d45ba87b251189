"""Self-contained inference artifact ("container") export/load.

Parity target: scripts/convert_to_container_moe.py:22-76 +
models/mega_nerf_container.py — the reference packages a trained model as a
TorchScript module with centroids/grid metadata. The JAX-native equivalent
is a directory:

    container/
      model_config.json    everything needed to rebuild the module
                           (layer graph, flags, scene geometry)
      params.msgpack       flax-serialized parameters (fg [+ bg])

`load_container` rebuilds the Flax module(s) and returns ready-to-apply
params — no checkpoint/optimizer state, no training flags.
"""
from __future__ import annotations

import json
from argparse import Namespace
from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

_MODEL_KEYS = [
    "use_moe", "bg_use_moe", "bg_use_cfg", "moe_expert_num",
    "moe_capacity_factor", "model", "model_bg", "pos_xyz_dim", "pos_dir_dim",
    "layers", "skip_layers", "layer_dim", "bg_layer_dim", "appearance_dim",
    "affine_appearance", "use_cascade", "sh_deg", "shifted_softplus",
    "use_mip", "nerfmoe_class_name", "batch_prioritized_routing",
    "gate_noise", "use_load_importance_loss", "compute_balance_loss",
    "dispatcher_no_score", "dispatcher_no_postscore",
    "use_moe_external_gate", "use_gate_input_norm", "moe_use_residual",
    "moe_return_gates", "moe_return_gate_logits", "moe_train_batch",
    "moe_test_batch", "amp", "amp_use_bfloat16", "bg_nerf", "fine_samples",
    "no_expert_parallel", "container_path", "train_mega_nerf",
]


def save_container(path, hparams, params, appearance_count: int,
                   scene: Optional[dict] = None) -> Path:
    """params: {"nerf": ..., optional "bg_nerf": ...}."""
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    cfg = {k: getattr(hparams, k, None) for k in _MODEL_KEYS}
    cfg["appearance_count"] = appearance_count
    cfg["scene"] = scene or {}
    (path / "model_config.json").write_text(json.dumps(cfg, indent=1))
    host = jax.device_get(params)
    (path / "params.msgpack").write_bytes(serialization.to_bytes(host))
    return path


def load_container(path) -> Tuple[object, Optional[object], dict, dict]:
    """Returns (nerf_module, bg_module_or_None, params, config)."""
    from switch_nerf_tpu.models.model_utils import get_bg_nerf, get_nerf

    path = Path(path)
    cfg = json.loads((path / "model_config.json").read_text())
    h = Namespace(**{k: v for k, v in cfg.items()
                     if k not in ("appearance_count", "scene")})
    appearance_count = cfg["appearance_count"]

    nerf = get_nerf(h, appearance_count)
    bg = get_bg_nerf(h, appearance_count) if getattr(h, "bg_nerf", False) \
        else None

    # template init to obtain the pytree structure, then overwrite
    # (shared with create_train_state — input-width formulas in one place)
    from switch_nerf_tpu.trainer import init_params
    template = init_params(jax.random.PRNGKey(0), h, nerf, bg)
    params = serialization.from_bytes(
        jax.device_get(template), (path / "params.msgpack").read_bytes())
    return nerf, bg, params, cfg
