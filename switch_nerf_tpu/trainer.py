"""Functional training core: state, optimizer, jitted/sharded train_step.

Replaces the reference Runner's training engine (runner.py:476-760,
1077-1259) with the JAX recipe:

    state = create_train_state(rng, hparams, model, bg_model)
    train_step = make_train_step(model, bg_model, hparams, render_cfg, scene)
    state, metrics = jit(train_step)(state, batch)   # SPMD over the mesh

Parity notes:
  * optimizer — Adam(lr) per model + per-step ExponentialLR with
    gamma = lr_decay_factor**(1/train_iterations) (runner.py:485-516);
    realised as optax.adam over the joint {nerf, bg_nerf} tree with an
    optax.exponential_decay schedule (Adam is per-leaf, so one joint
    transform is numerically identical to two).
  * loss — photo mse (+ coarse mse avg for mip/cascade) +
    moe_l_aux_wt * mean(gate_loss) avg of coarse&fine (+ bg gate)
    (runner.py:646-656, _training_step* :1077-1259).
  * AMP — bf16 compute dtype; no GradScaler (bf16 has fp32 exponent range,
    fp16 loss-scaling machinery from runner.py:483,677-690 is dead weight on
    TPU). fp32 gate + fp32 sigma head preserved in the models.
  * finite-check skip — the reference's cross-rank all_gather vote + no_sync
    dummy backward (runner.py:620-673) becomes a lax.cond that keeps the old
    state when any train metric is non-finite; under SPMD the verdict is
    computed on the global batch, so every shard agrees by construction.
  * grad accumulation (accumulation_steps, runner.py:677-690) — handled by
    optax.MultiSteps.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from switch_nerf_tpu.render.rendering import RenderConfig, render_rays
from switch_nerf_tpu.render.rendering_mip import render_rays_mip


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray                    # int32 scalar
    params: Any                          # {"nerf": ..., "bg_nerf": ...?}
    opt_state: Any
    rng: jax.Array                       # per-host deterministic PRNG chain
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt)


@dataclasses.dataclass(frozen=True)
class SceneInfo:
    """Static per-scene geometry for the fg/bg split."""
    sphere_center: Optional[Any] = None   # [3]
    sphere_radius: Optional[Any] = None   # [3] (ellipse) or scalar


def create_optimizer(hparams) -> optax.GradientTransformation:
    acc = getattr(hparams, "accumulation_steps", 1) or 1
    if getattr(hparams, "no_optimizer_schedulers", False):
        schedule = hparams.lr
    else:
        gamma = hparams.lr_decay_factor ** (1.0 / hparams.train_iterations)
        # under MultiSteps the schedule advances once per OPTIMIZER step
        # while the reference steps ExponentialLR every micro-iteration
        # (runner.py:692-693). The reference's optimizer step c fires at
        # micro-iteration (c+1)*acc - 1, AFTER the scheduler has stepped
        # acc*c + (acc-1) times — so the applied lr is
        # lr0 * gamma^(acc*c + acc - 1): decay_rate gamma^acc with a
        # gamma^(acc-1) prefactor reproduces it exactly (acc=1: plain).
        schedule = optax.exponential_decay(
            init_value=hparams.lr * gamma ** (acc - 1), transition_steps=1,
            decay_rate=gamma ** acc)
    tx = optax.adam(learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8)
    if acc > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=acc)
    return tx


def render_config_from_hparams(hparams, train_batch: bool = True) -> RenderConfig:
    return RenderConfig(
        coarse_samples=hparams.coarse_samples,
        fine_samples=hparams.fine_samples,
        perturb=hparams.perturb,
        model_chunk_size=hparams.model_chunk_size,
        bg_model_chunk_size=getattr(hparams, "bg_model_chunk_size", None),
        pos_dir_dim=hparams.pos_dir_dim,
        use_cascade=hparams.use_cascade,
        white_bkgd=hparams.white_bkgd,
        use_random_background_color=hparams.use_random_background_color,
        use_sigma_noise=hparams.use_sigma_noise,
        sigma_noise_std=hparams.sigma_noise_std,
        use_mip=hparams.use_mip,
        sh_deg=hparams.sh_deg,
        rgb_padding=hparams.rgb_padding if hparams.use_mip else None,
        weights_resample_padding=hparams.weights_resample_padding,
        stop_level_grad=hparams.stop_level_grad,
        return_pts=getattr(hparams, "return_pts", False),
        return_pts_rgb=getattr(hparams, "return_pts_rgb", False),
        return_pts_alpha=getattr(hparams, "return_pts_alpha", False),
        return_sigma=getattr(hparams, "return_sigma", False),
        return_alpha=getattr(hparams, "return_alpha", False),
        remat_chunks=getattr(hparams, "remat", True),
    )


def make_model_fn(model, params, use_coarse: Optional[bool] = None):
    """Adapt a Flax module to the renderer's ModelFn contract:
    model_fn(points [P,D], sigma_noise, rng, train) -> (out [P,4], moe_loss [L]).

    use_coarse selects the level on Cascade models (cascade.py parity).
    """
    kwargs = {} if use_coarse is None else {"use_coarse": use_coarse}

    def model_fn(pts, sigma_noise, mrng, is_train):
        # one base key serves both collections: flax's make_rng folds the
        # module path into each stream, so gate-noise and dropout draws
        # never collide (and no fold_in here means no extra trace consts)
        rngs = ({"gate_noise": mrng, "dropout": mrng}
                if (is_train and mrng is not None) else None)
        out = model.apply({"params": params}, pts, sigma_noise=sigma_noise,
                          deterministic=not is_train, rngs=rngs, **kwargs)
        if isinstance(out, dict):
            moe = out["extras"].get("moe_loss",
                                    jnp.zeros((0,), jnp.float32))
            return out["outputs"], moe
        return out, jnp.zeros((0,), jnp.float32)
    return model_fn


def make_model_fn_pair(model, params):
    """(coarse_fn, fine_fn_or_None) — fine differs only for Cascade.

    Model randomness (gate noise / dropout) is NOT threaded here: the
    renderer supplies per-chunk keys through model_fn's mrng argument
    (rendering.run_model_chunked splits the step key)."""
    from switch_nerf_tpu.models.cascade import Cascade
    if isinstance(model, Cascade):
        return (make_model_fn(model, params, use_coarse=True),
                make_model_fn(model, params, use_coarse=False))
    return make_model_fn(model, params), None


def _mse(pred, target):
    return jnp.mean(jnp.square(pred.astype(jnp.float32)
                               - target.astype(jnp.float32)))


def _psnr(mse):
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))


def compute_losses(results: Dict[str, jnp.ndarray], rgbs, hparams,
                   mip_or_cascade_coarse: bool) -> Dict[str, jnp.ndarray]:
    """_training_step* metric/loss computation (runner.py:1077-1259)."""
    typ = "fine" if "rgb_fine" in results else "coarse"
    photo_loss = _mse(results[f"rgb_{typ}"], rgbs)
    metrics = {
        "psnr": _psnr(photo_loss),
        "photo_loss": photo_loss,
        "loss": photo_loss,
    }
    if f"depth_variance_{typ}" in results:
        metrics["depth_variance"] = jnp.mean(results[f"depth_variance_{typ}"])

    if mip_or_cascade_coarse and typ != "coarse":
        coarse_loss = _mse(results["rgb_coarse"], rgbs)
        metrics["coarse_loss"] = coarse_loss
        metrics["loss"] = (metrics["loss"] + coarse_loss) / 2.0

    use_moe = (hparams.use_moe or getattr(hparams, "bg_use_moe", False))
    if use_moe and hparams.use_balance_loss:
        gl = results.get(f"gate_loss_{typ}")
        if gl is not None and gl.size:
            gate_loss = jnp.mean(gl)
            if typ == "fine" and results.get("gate_loss_coarse") is not None \
                    and results["gate_loss_coarse"].size:
                gate_loss = (gate_loss
                             + jnp.mean(results["gate_loss_coarse"])) / 2.0
            metrics["gate_loss"] = gate_loss
        bgl = results.get(f"bg_gate_loss_{typ}")
        if getattr(hparams, "bg_use_moe", False) and bgl is not None and bgl.size:
            bg_gate = jnp.mean(bgl)
            bgc = results.get("bg_gate_loss_coarse")
            if typ == "fine" and bgc is not None and bgc.size:
                bg_gate = (bg_gate + jnp.mean(bgc)) / 2.0
            metrics["bg_gate_loss"] = bg_gate

    all_loss = metrics["loss"]
    if use_moe and hparams.use_balance_loss:
        if "gate_loss" in metrics:
            all_loss = all_loss + hparams.moe_l_aux_wt * metrics["gate_loss"]
        if "bg_gate_loss" in metrics:
            all_loss = all_loss + hparams.moe_l_aux_wt * metrics["bg_gate_loss"]
    metrics["all_loss"] = all_loss
    return metrics


def _reset_multisteps(opt_state):
    """Zero a MultiSteps accumulator (mini_step + acc_grads) wherever it
    appears in an optimizer-state pytree, leaving the inner state alone."""
    def reset(node):
        if isinstance(node, optax.MultiStepsState):
            return node._replace(
                mini_step=jnp.zeros_like(node.mini_step),
                acc_grads=jax.tree_util.tree_map(jnp.zeros_like,
                                                 node.acc_grads))
        return node

    return jax.tree_util.tree_map(
        reset, opt_state,
        is_leaf=lambda n: isinstance(n, optax.MultiStepsState))


def make_train_step(model, bg_model, hparams, render_cfg: RenderConfig,
                    scene: SceneInfo,
                    mip: bool = False) -> Callable:
    """Build train_step(state, batch) -> (state, metrics).

    batch: {"rgbs": [B,3], "rays": [B,8], optional "radii": [B,1],
    optional "image_indices": [B]}. jit/shard the returned callable.
    """
    check_finite = not getattr(hparams, "disable_check_finite", False)

    def loss_fn(params, batch, rng):
        model_fn, model_fn_fine = make_model_fn_pair(model, params["nerf"])
        image_indices = batch.get("image_indices") \
            if hparams.appearance_dim > 0 else None
        if mip:
            results = render_rays_mip(
                model_fn, batch["rays"], batch["radii"], image_indices,
                render_cfg, rng, train=True, get_depth_variance=True)
            metrics = compute_losses(results, batch["rgbs"], hparams,
                                     mip_or_cascade_coarse=True)
        else:
            bg_fn, bg_fn_fine = None, None
            if bg_model is not None and "bg_nerf" in params:
                bg_fn, bg_fn_fine = make_model_fn_pair(
                    bg_model, params["bg_nerf"])
            results = render_rays(
                model_fn, bg_fn, batch["rays"], image_indices, render_cfg,
                scene.sphere_center, scene.sphere_radius, rng, train=True,
                get_depth_variance=True, model_fn_fine=model_fn_fine,
                bg_model_fn_fine=bg_fn_fine)
            metrics = compute_losses(results, batch["rgbs"], hparams,
                                     mip_or_cascade_coarse=hparams.use_cascade)
        return metrics["all_loss"], metrics

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng, step_rng = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, batch, step_rng)

        if check_finite:
            # skip-step on non-finite metrics (runner.py:620-673); psnr=inf
            # (perfect fit) is excluded like the reference.
            scalars = [v for k, v in metrics.items() if k != "psnr"]
            finite = jnp.stack([jnp.isfinite(s).all() for s in scalars]).all()

            def _skip():
                st = state.replace(rng=rng)
                if getattr(hparams, "accumulation_steps", 1) > 1:
                    # discard the whole accumulation window like the
                    # reference's zero_grad + continue (runner.py:662-673):
                    # keeping MultiSteps' partial acc_grads would let a
                    # poisoned window complete and apply later
                    st = st.replace(
                        opt_state=_reset_multisteps(st.opt_state))
                return st

            new_state = jax.lax.cond(
                finite,
                lambda: state.apply_gradients(grads).replace(rng=rng),
                _skip)
            metrics = dict(metrics, finite=finite.astype(jnp.float32))
        else:
            new_state = state.apply_gradients(grads).replace(rng=rng)
        return new_state, metrics

    return train_step


def make_eval_step(model, bg_model, hparams, render_cfg: RenderConfig,
                   scene: SceneInfo, mip: bool = False) -> Callable:
    """eval_step(params, batch, rng) -> results dict (no grads, det=True)."""
    def eval_step(params, batch, rng=None):
        model_fn, model_fn_fine = make_model_fn_pair(model, params["nerf"])
        image_indices = batch.get("image_indices") \
            if hparams.appearance_dim > 0 else None
        if mip:
            return render_rays_mip(model_fn, batch["rays"], batch["radii"],
                                   image_indices, render_cfg, rng,
                                   train=False, get_depth=True)
        bg_fn, bg_fn_fine = None, None
        if bg_model is not None and "bg_nerf" in params:
            bg_fn, bg_fn_fine = make_model_fn_pair(
                bg_model, params["bg_nerf"])
        return render_rays(model_fn, bg_fn, batch["rays"], image_indices,
                           render_cfg, scene.sphere_center,
                           scene.sphere_radius, rng, train=False,
                           get_depth=True, model_fn_fine=model_fn_fine,
                           bg_model_fn_fine=bg_fn_fine,
                           # fg/bg decomposition for the eval viz protocol
                           # (reference render_image, runner.py:2874)
                           get_bg_fg_rgb=True)
    return eval_step


def init_params(rng: jax.Array, hparams, model, bg_model,
                bg_rng: Optional[jax.Array] = None):
    """Initialise (or template-init) the fg (+bg) parameter pytree.

    Shared by create_train_state and container.load_container so the
    input-width formulas live in exactly one place. Mip-ness follows the
    same rule as get_nerf (model_utils.py:44): the MipNeRFMoE class name
    alone selects the 6-wide (mean, cov) xyz input even when use_mip is
    unset."""
    r_init = rng
    r_bg = bg_rng if bg_rng is not None else jax.random.fold_in(rng, 1)
    class_name = getattr(hparams, "nerfmoe_class_name", "NeRFMoE") or "NeRFMoE"
    use_mip = class_name == "MipNeRFMoE" or getattr(hparams, "use_mip", False)

    n_pts = 8
    d_pts = (6 if use_mip else 3) \
        + (3 if hparams.pos_dir_dim > 0 else 0) \
        + (1 if hparams.appearance_dim > 0 else 0)
    pts = jnp.zeros((n_pts, d_pts), jnp.float32)
    params = {"nerf": model.init(
        {"params": r_init, "gate_noise": r_init}, pts)["params"]}

    if bg_model is not None:
        d_bg = 4 + (3 if hparams.pos_dir_dim > 0 else 0) \
            + (1 if hparams.appearance_dim > 0 else 0)
        bg_pts = jnp.zeros((n_pts, d_bg), jnp.float32)
        params["bg_nerf"] = bg_model.init(
            {"params": r_bg, "gate_noise": r_bg}, bg_pts)["params"]
    return params


def create_train_state(rng: jax.Array, hparams, model, bg_model
                       ) -> TrainState:
    """Initialise params for fg (+bg) models and the optimizer state."""
    tx = create_optimizer(hparams)
    r_init, r_bg, r_chain = jax.random.split(rng, 3)
    params = init_params(r_init, hparams, model, bg_model, bg_rng=r_bg)
    opt_state = tx.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=opt_state, rng=r_chain, tx=tx)
