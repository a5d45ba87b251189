"""Cross-framework numerics parity: our modules + checkpoint converter vs
the ACTUAL reference implementation (PyTorch, /root/reference) on CPU.

These are the strongest correctness tests in the suite: random reference
models are forwarded in torch, their state_dicts converted with
scripts/convert_torch_ckpt.py's mapping, and our JAX modules must reproduce
the outputs to fp32 tolerance. Skipped when /root/reference is absent.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.reference_stubs import install_stubs, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not mounted")


@pytest.fixture(scope="module", autouse=True)
def _stubs():
    install_stubs()


def test_dense_nerf_parity():
    import torch
    from switch_nerf.models.nerf import NeRF as RefNeRF, ShiftedSoftplus

    torch.manual_seed(0)
    ref = RefNeRF(pos_xyz_dim=4, pos_dir_dim=2, layers=3, skip_layers=[1],
                  layer_dim=24, appearance_dim=6, affine_appearance=False,
                  appearance_count=5, rgb_dim=3, xyz_dim=3,
                  sigma_activation=ShiftedSoftplus()).eval()

    n = 17
    x_np = np.concatenate([
        np.random.default_rng(0).normal(0, 1, (n, 6)).astype(np.float32),
        np.random.default_rng(1).integers(0, 5, (n, 1)).astype(np.float32),
    ], -1)
    with torch.no_grad():
        want = ref(torch.tensor(x_np)).numpy()

    sys.path.insert(0, "/root/repo")
    from scripts.convert_torch_ckpt import (convert_dense_nerf_state_dict,
                                            unflatten)
    from switch_nerf_tpu.models.nerf import NeRF

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = unflatten(convert_dense_nerf_state_dict(sd))

    import jax.numpy as jnp
    ours = NeRF(pos_xyz_dim=4, pos_dir_dim=2, layers=3, skip_layers=(1,),
                layer_dim=24, appearance_dim=6, appearance_count=5,
                rgb_dim=3, xyz_dim=3)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x_np)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _build_ref_moe(expert_type, seed=7, m=16, e=4, layer_num=2, skips=(1,),
                   top_k=1, bpr=True):
    import torch
    from switch_nerf.modules.tutel_moe_ext.tutel_moe_nobatch import moe_layer
    from switch_nerf.modules.tutel_moe_ext.tutel_moe_layer_nobatch import \
        SingleExpert

    torch.manual_seed(seed)
    if expert_type == "expertmlp":
        experts = {"type": "expertmlp", "count_per_node": e,
                   "layer_num": layer_num, "skips": list(skips),
                   "init_factor": 1.0}
    else:
        net = torch.nn.ModuleList(
            [SingleExpert(m, layer_num, skips=list(skips))
             for _ in range(e)])
        experts = {"type": "seqexperts", "count_per_node": e, "net": net}
    return moe_layer(
        gate_type={"type": "top", "k": top_k, "fp32_gate": True,
                   "gate_dim": m, "capacity_factor": 1.0,
                   "gate_noise": -1.0, "batch_prioritized_routing": bpr},
        model_dim=m, experts=experts, seeds=(1, 2, 3),
        scan_expert_func=None)


def test_moe_layer_parity():
    """expertmlp reference state -> (a) reference seqexperts forward
    (the reference's own eval pathway via convert_to_seqexperts) and
    (b) our MoELayer with the converted checkpoint — all three agree."""
    import torch
    from switch_nerf.models.model_utils import convert_to_seqexperts

    m, e = 16, 4
    ref_mlp = _build_ref_moe("expertmlp").eval()
    sd = {f"layers.0.{k}": v.clone()
          for k, v in ref_mlp.state_dict().items()}

    # reference's own eval-format migration + pure-torch forward
    def strip(k):
        for prefix in ("module.layers.0.", "layers.0."):
            if k.startswith(prefix):
                return k[len(prefix):]
        return k
    sd_seq = convert_to_seqexperts({k: v.clone() for k, v in sd.items()})
    sd_seq = {strip(k): v for k, v in sd_seq.items()}
    ref_seq = _build_ref_moe("seqexperts").eval()
    ref_seq.load_state_dict(sd_seq)

    x = torch.tensor(np.random.default_rng(3).normal(
        0, 1, (64, m)).astype(np.float32))
    with torch.no_grad():
        want = ref_seq(
            x, gate_input=x,
            apply_on_expert_fn_name="apply_on_expert_fn_nobatch_torch")
    l_aux_want = float(want.l_aux)
    want = want.numpy()

    # the reference's KERNEL nobatch path (apply_on_expert_fn_nobatch,
    # variable-split dispatch via the tutel_sparse_nobatch CPU kernel
    # equivalents) agrees with its pure-torch variant — with BPR OFF.
    # Reference bug: with batch_prioritized_routing=True that path derives
    # expert_input_nums from locations1[-1, :] (the UNSORTED last token's
    # masked location row, garbage under BPR) and trips its own assert at
    # tutel_fast_dispatch_nobatch.py:32; unreachable in published configs,
    # which always pass --moe_train_batch/--moe_test_batch.
    ref_nb_t = _build_ref_moe("seqexperts", bpr=False).eval()
    ref_nb_t.load_state_dict(sd_seq)
    ref_nb_k = _build_ref_moe("seqexperts", bpr=False).eval()
    ref_nb_k.load_state_dict(sd_seq)
    ref_nb_k.moe_no_batch = True  # default forward -> nobatch kernel path
    with torch.no_grad():
        want_nobpr = ref_nb_t(
            x, gate_input=x,
            apply_on_expert_fn_name="apply_on_expert_fn_nobatch_torch")
        got_kernel = ref_nb_k(x, gate_input=x)
    np.testing.assert_allclose(got_kernel.numpy(), want_nobpr.numpy(),
                               rtol=1e-5, atol=1e-6)
    import pytest
    ref_seq.moe_no_batch = True
    with pytest.raises(AssertionError):  # the documented reference bug
        with torch.no_grad():
            ref_seq(x, gate_input=x)
    ref_seq.moe_no_batch = False

    # our converter + MoELayer (no-drop mode == reference nobatch)
    sys.path.insert(0, "/root/repo")
    import jax.numpy as jnp
    from scripts.convert_torch_ckpt import (convert_nerf_moe_state_dict,
                                            unflatten)
    from switch_nerf_tpu.models.moe import MoELayer

    flat = convert_nerf_moe_state_dict(
        {k: v.numpy() for k, v in sd.items()})
    params = unflatten(flat)["layer_0"]
    ours = MoELayer(model_dim=m, num_experts=e, layer_num=2, skips=(1,),
                    top_k=1, batch_prioritized_routing=True,
                    train_dispatch="nodrop", eval_dispatch="nodrop")
    y, l_aux, _ = ours.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(l_aux), l_aux_want, rtol=1e-5)

    # padded all-fit mode agrees too
    ours_p = MoELayer(model_dim=m, num_experts=e, layer_num=2, skips=(1,),
                      top_k=1, capacity_factor=4.0,
                      batch_prioritized_routing=True)
    y2, _, _ = ours_p.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y2), want, rtol=1e-4, atol=1e-5)


def test_moe_layer_batch_path_parity():
    """The reference's BATCH dispatch path — what --moe_train_batch /
    --moe_test_batch select (runner.py:479/764 set_no_batch(False) ->
    tutel_moe_layer_nobatch.py:775 apply_on_expert_fn, REAL tutel sparse
    kernels on the [E*capacity, M] grid, run on CPU via the pure-torch
    kernel equivalents in reference_stubs) — vs our padded MoELayer, on an
    IMBALANCED batch WITH capacity-overflow drops: forward, l_aux, input
    grads, and every converted parameter grad agree. All published
    training commands use --moe_train_batch (reference README.md:71), so
    this pins the production dispatch directly against the reference
    rather than against our einsum oracle."""
    import torch

    import jax
    import jax.numpy as jnp
    from scripts.convert_torch_ckpt import (convert_nerf_moe_state_dict,
                                            unflatten)
    from switch_nerf_tpu.models.moe import MoELayer

    m, e, s = 16, 4, 64
    ref = _build_ref_moe("expertmlp").train()  # moe_no_batch=False default
    x_np = np.random.default_rng(5).normal(0, 1, (s, m)).astype(np.float32)
    x = torch.tensor(x_np, requires_grad=True)
    out = ref(x, gate_input=x)
    (out.float().pow(2).sum() + out.l_aux).backward()
    want_y = out.detach().numpy()
    want_laux = float(out.l_aux)

    # the batch is genuinely imbalanced: dropped tokens decode to exact 0
    dropped = int((np.abs(want_y).max(1) == 0.0).sum())
    assert dropped > 0, "probe batch must exercise capacity drops"

    sd = {f"layers.0.{k}": v.clone() for k, v in ref.state_dict().items()}
    params = unflatten(convert_nerf_moe_state_dict(
        {k: v.numpy() for k, v in sd.items()}))["layer_0"]
    ours = MoELayer(model_dim=m, num_experts=e, layer_num=2, skips=(1,),
                    top_k=1, capacity_factor=1.0,
                    batch_prioritized_routing=True,
                    train_dispatch="padded", eval_dispatch="padded")

    def loss_fn(p, xj):
        y, laux, _ = ours.apply({"params": p}, xj)
        return jnp.sum(y.astype(jnp.float32) ** 2) + laux, (y, laux)

    (_, (y, laux)), (gp, gx) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(y), want_y, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(laux), want_laux, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gx), x.grad.numpy(),
                               rtol=1e-4, atol=1e-5)

    # parameter grads convert through the same (linear) checkpoint mapping
    gt = unflatten(convert_nerf_moe_state_dict(
        {f"layers.0.{k}": v.grad.numpy()
         for k, v in ref.named_parameters()}))["layer_0"]
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), b,
                                                rtol=1e-4, atol=1e-5),
        gp, gt)


def test_full_nerfmoe_graph_parity():
    """Whole layer-graph parity: reference NeRFMoE (PE, external gate,
    gate-input LayerNorm, MoE trunk, sigma/dir/color taps, appearance
    embedding) vs our NeRFMoE with the converted checkpoint."""
    import types
    import torch

    m, e = 16, 4
    graph = {
        "layer_num_main": 3, "sigma_tag": 0, "dir_tag": 1, "color_tag": 2,
        "layers": {
            "xyz": {"in_ch": 15, "h_ch": 0, "out_ch": m, "num": 1,
                    "type": "mlp", "act": "none"},
            "0": {"in_ch": m, "h_ch": m, "out_ch": m, "num": 2,
                  "skips": [1], "init_factor": 1.0, "type": "moe",
                  "act": "relu", "gate_type": "top", "k": 1,
                  "fp32_gate": True, "gate_dim": m},
            "1": {"in_ch": m, "h_ch": 0, "out_ch": m, "num": 1,
                  "type": "mlp", "act": "none"},
            "2": {"in_ch": m + 9 + 4, "h_ch": 0, "out_ch": 8, "num": 1,
                  "type": "mlp", "act": "relu"},
            "sigma": {"in_ch": m, "h_ch": 0, "out_ch": 1, "num": 1,
                      "type": "mlp", "act": "none"},
            "color": {"in_ch": 8, "h_ch": 0, "out_ch": 3, "num": 1,
                      "type": "mlp", "act": "none"},
            "moe_external_gate": {"in_ch": m, "h_ch": m, "out_ch": m,
                                  "num": 2, "type": "mlp", "act": "none"},
            "gate_input_norm": {"in_ch": m, "h_ch": 0, "out_ch": 0,
                                "num": 1, "type": "layernorm"},
        },
    }

    def ref_args(expert_type):
        return types.SimpleNamespace(
            sh_deg=None, shifted_softplus=True, pos_xyz_dim=2,
            pos_dir_dim=1, appearance_dim=4, affine_appearance=False,
            nerfmoe_class_name="NeRFMoE", model=graph,
            moe_expert_type=expert_type, moe_expert_num=e,
            moe_capacity_factor=1.0, batch_prioritized_routing=True,
            gate_noise=-1.0, use_load_importance_loss=False,
            compute_balance_loss=False, dispatcher_no_score=False,
            dispatcher_no_postscore=False, use_moe_external_gate=True,
            use_gate_input_norm=True, moe_use_residual=False,
            moe_return_gates=False, moe_return_gate_logits=False,
            use_moe=True, amp_use_bfloat16=False, bf16=False,
            no_expert_parallel=True, moe_local_expert_num=e,
            single_data_group=None, use_fp32_in_moe=False,
            moe_layer_num=1, apply_on_expert_fn_name=None,
            no_feature_mapping_relu=False,
            parallel_env=types.SimpleNamespace(global_rank=0),
        )

    from switch_nerf.models.model_utils import convert_to_seqexperts
    from switch_nerf.models.nerf_moe import get_nerf_moe_inner
    from switch_nerf.modules.tutel_moe_ext.tutel_moe_layer_nobatch import \
        MOELayer as RefMOELayer

    torch.manual_seed(11)
    ref_a = get_nerf_moe_inner(ref_args("expertmlp"), appearance_count=4,
                               xyz_dim=3).eval()
    sd = {k: v.clone() for k, v in ref_a.state_dict().items()}

    # reference eval-format migration, then the pure-torch strategy
    sd_seq = convert_to_seqexperts({k: v.clone() for k, v in sd.items()})
    sd_seq = {(k[len("module."):] if k.startswith("module.") else k): v
              for k, v in sd_seq.items()}
    torch.manual_seed(12)
    ref_b = get_nerf_moe_inner(ref_args("seqexperts"), appearance_count=4,
                               xyz_dim=3).eval()
    ref_b.load_state_dict(sd_seq)
    for mod in ref_b.modules():
        if isinstance(mod, RefMOELayer):
            orig = mod.forward

            def patched(inp, _orig=orig, **kw):
                kw["apply_on_expert_fn_name"] = \
                    "apply_on_expert_fn_nobatch_torch"
                return _orig(inp, **kw)
            mod.forward = patched

    rng = np.random.default_rng(5)
    n = 33
    x_np = np.concatenate([
        rng.normal(0, 1, (n, 6)).astype(np.float32),
        rng.integers(0, 4, (n, 1)).astype(np.float32)], -1)
    with torch.no_grad():
        want = ref_b(torch.tensor(x_np))["outputs"].numpy()

    # ours from the converted expertmlp checkpoint
    import jax.numpy as jnp
    from scripts.convert_torch_ckpt import (convert_nerf_moe_state_dict,
                                            unflatten)
    from switch_nerf_tpu.models.nerf_moe import NeRFMoE

    flat = convert_nerf_moe_state_dict(
        {k: v.numpy() for k, v in sd.items()})
    params = unflatten(flat)
    ours = NeRFMoE(
        layer_cfg=dict(graph, expert_num=e), pos_xyz_dim=2, pos_dir_dim=1,
        appearance_dim=4, appearance_count=4, xyz_dim=3,
        batch_prioritized_routing=True, use_moe_external_gate=True,
        use_gate_input_norm=True, train_dispatch="nodrop",
        eval_dispatch="nodrop")
    got = ours.apply({"params": params}, jnp.asarray(x_np),
                     deterministic=True)["outputs"]
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_render_rays_parity():
    """Full rendering-path parity: reference render_rays (fg/bg sphere
    split, inverted-sphere background, coarse+fine hierarchical sampling,
    merge, compositing) vs ours, same dense NeRFs, eval mode
    (perturb=0 => fully deterministic)."""
    import types
    import torch
    from switch_nerf.models.nerf import NeRF as RefNeRF, ShiftedSoftplus
    from switch_nerf.rendering import render_rays as ref_render_rays

    torch.manual_seed(0)
    fg_t = RefNeRF(2, 1, 2, [1], 16, 4, False, 5, 3, 3,
                   ShiftedSoftplus()).eval()
    torch.manual_seed(1)
    bg_t = RefNeRF(2, 1, 2, [1], 16, 4, False, 5, 3, 4,
                   ShiftedSoftplus()).eval()

    hp = types.SimpleNamespace(
        perturb=0.0, coarse_samples=8, fine_samples=8,
        model_chunk_size=4096, use_cascade=False, sh_deg=None,
        pos_dir_dim=1, white_bkgd=False, use_random_background_color=False,
        use_sigma_noise=False, sigma_noise_std=0.0, use_moe=False,
        bg_use_moe=False, moe_return_gates=False, return_pts=False,
        return_pts_rgb=False, return_pts_alpha=False, return_sigma=False,
        return_alpha=False, use_load_importance_loss=False,
        compute_balance_loss=False, container_path=None,
        train_mega_nerf=None)

    rng = np.random.default_rng(4)
    n = 24
    o = rng.normal(0, 0.2, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_np = np.concatenate(
        [o, d, np.full((n, 1), 0.1, np.float32),
         np.full((n, 1), 1e5, np.float32)], -1)
    idx_np = rng.integers(0, 5, (n,)).astype(np.float32)
    center = np.zeros(3, np.float32)
    radius = np.array([1.2, 1.1, 1.3], np.float32)

    with torch.no_grad():
        ref_res, _ = ref_render_rays(
            nerf=fg_t, bg_nerf=bg_t, rays=torch.tensor(rays_np),
            image_indices=torch.tensor(idx_np), hparams=hp,
            sphere_center=torch.tensor(center),
            sphere_radius=torch.tensor(radius),
            get_depth=True, get_depth_variance=False, get_bg_fg_rgb=False)
    want_rgb = ref_res["rgb_fine"].numpy()
    want_depth = ref_res["depth_fine"].numpy()

    # ours, converted weights
    import jax.numpy as jnp
    from scripts.convert_torch_ckpt import (convert_dense_nerf_state_dict,
                                            unflatten)
    from switch_nerf_tpu.models.nerf import NeRF
    from switch_nerf_tpu.render.rendering import RenderConfig, render_rays
    from switch_nerf_tpu.trainer import make_model_fn

    fg = NeRF(pos_xyz_dim=2, pos_dir_dim=1, layers=2, skip_layers=(1,),
              layer_dim=16, appearance_dim=4, appearance_count=5,
              rgb_dim=3, xyz_dim=3)
    bg = NeRF(pos_xyz_dim=2, pos_dir_dim=1, layers=2, skip_layers=(1,),
              layer_dim=16, appearance_dim=4, appearance_count=5,
              rgb_dim=3, xyz_dim=4)
    fg_p = unflatten(convert_dense_nerf_state_dict(
        {k: v.numpy() for k, v in fg_t.state_dict().items()}))
    bg_p = unflatten(convert_dense_nerf_state_dict(
        {k: v.numpy() for k, v in bg_t.state_dict().items()}))

    cfg = RenderConfig(coarse_samples=8, fine_samples=8, perturb=0.0,
                       model_chunk_size=4096, pos_dir_dim=1)
    res = render_rays(
        make_model_fn(fg, fg_p),
        make_model_fn(bg, bg_p),
        jnp.asarray(rays_np), jnp.asarray(idx_np), cfg,
        jnp.asarray(center), jnp.asarray(radius), None, train=False,
        get_depth=True)
    np.testing.assert_allclose(np.asarray(res["rgb_fine"]), want_rgb,
                               rtol=1e-4, atol=1e-5)
    # depth_fine is NOT compared on bg rays: the reference pairs the
    # UNFLIPPED bg depth_real with flipped rgbs/sigmas at the coarse pass
    # (rendering.py:302-304 flips xyz/z_vals only; :479-480 stores
    # depth_real unflipped; the fine merge then gathers mismatched rows).
    # We keep the consistent pairing; bg depth is an eval visualization
    # output only. fg rays (no bg contribution) must still agree:
    fg_only = ~np.asarray(ref_res.get("bg_lambda_fine",
                                      torch.ones(n)).numpy() > 0)
    got_depth = np.asarray(res["depth_fine"])
    if fg_only.any():
        np.testing.assert_allclose(got_depth[fg_only], want_depth[fg_only],
                                   rtol=1e-3, atol=1e-3)


def test_render_rays_mip_parity():
    """mip-NeRF rendering parity: conical-frustum IPE casting, blurred-weight
    resampling, rgb padding — reference vs ours, eval mode (deterministic).

    Uses a dense NeRF on 6-dim (mean, cov) inputs via our MipNeRFMoE-style
    contract; the reference mip path calls nerf(x) with x = [mean|cov|dir|idx],
    so a reference NeRFMoE in mip form is required. We instead compare with a
    reference MipNeRFMoE built from get_nerf_moe_inner (seqexperts,
    pure-torch MoE strategy)."""
    import types
    import torch

    m, e = 16, 4
    graph = {
        "layer_num_main": 3, "sigma_tag": 0, "dir_tag": 1, "color_tag": 2,
        "layers": {
            "xyz": {"in_ch": 15, "h_ch": 0, "out_ch": m, "num": 1,
                    "type": "mlp", "act": "none"},
            "0": {"in_ch": m, "h_ch": m, "out_ch": m, "num": 2,
                  "skips": [1], "init_factor": 1.0, "type": "moe",
                  "act": "relu", "gate_type": "top", "k": 1,
                  "fp32_gate": True, "gate_dim": m},
            "1": {"in_ch": m, "h_ch": 0, "out_ch": m, "num": 1,
                  "type": "mlp", "act": "none"},
            "2": {"in_ch": m + 9 + 4, "h_ch": 0, "out_ch": 8, "num": 1,
                  "type": "mlp", "act": "relu"},
            "sigma": {"in_ch": m, "h_ch": 0, "out_ch": 1, "num": 1,
                      "type": "mlp", "act": "none"},
            "color": {"in_ch": 8, "h_ch": 0, "out_ch": 3, "num": 1,
                      "type": "mlp", "act": "relu"},
            "moe_external_gate": {"in_ch": m, "h_ch": m, "out_ch": m,
                                  "num": 2, "type": "mlp", "act": "none"},
            "gate_input_norm": {"in_ch": m, "h_ch": 0, "out_ch": 0,
                                "num": 1, "type": "layernorm"},
        },
    }

    def ref_args(expert_type):
        return types.SimpleNamespace(
            sh_deg=None, shifted_softplus=True, pos_xyz_dim=2,
            pos_dir_dim=1, appearance_dim=4, affine_appearance=False,
            nerfmoe_class_name="MipNeRFMoE", model=graph,
            moe_expert_type=expert_type, moe_expert_num=e,
            moe_capacity_factor=1.0, batch_prioritized_routing=True,
            gate_noise=-1.0, use_load_importance_loss=False,
            compute_balance_loss=False, dispatcher_no_score=False,
            dispatcher_no_postscore=False, use_moe_external_gate=True,
            use_gate_input_norm=True, moe_use_residual=False,
            moe_return_gates=False, moe_return_gate_logits=False,
            use_moe=True, amp_use_bfloat16=False, bf16=False,
            no_expert_parallel=True, moe_local_expert_num=e,
            single_data_group=None, use_fp32_in_moe=False,
            moe_layer_num=1, apply_on_expert_fn_name=None,
            no_feature_mapping_relu=False,
            parallel_env=types.SimpleNamespace(global_rank=0),
            # rendering flags
            perturb=0.0, coarse_samples=6, fine_samples=6,
            model_chunk_size=4096, use_cascade=False, white_bkgd=False,
            use_sigma_noise=False, sigma_noise_std=0.0,
            use_random_background_color=False, return_pts=False,
            return_pts_rgb=False, return_pts_alpha=False,
            return_sigma=False, return_alpha=False,
            rgb_padding=0.001, weights_resample_padding=0.01,
            stop_level_grad=True,
            container_path=None, train_mega_nerf=None,
        )

    from switch_nerf.models.model_utils import convert_to_seqexperts
    from switch_nerf.models.nerf_moe import get_nerf_moe_inner
    from switch_nerf.modules.tutel_moe_ext.tutel_moe_layer_nobatch import \
        MOELayer as RefMOELayer
    from switch_nerf.rendering_mip import render_rays as ref_render_mip

    torch.manual_seed(21)
    args_a = ref_args("expertmlp")
    ref_a = get_nerf_moe_inner(args_a, appearance_count=4, xyz_dim=3).eval()
    sd = {k: v.clone() for k, v in ref_a.state_dict().items()}

    sd_seq = convert_to_seqexperts({k: v.clone() for k, v in sd.items()})
    sd_seq = {(k[len("module."):] if k.startswith("module.") else k): v
              for k, v in sd_seq.items()}
    torch.manual_seed(22)
    args_b = ref_args("seqexperts")
    ref_b = get_nerf_moe_inner(args_b, appearance_count=4, xyz_dim=3).eval()
    ref_b.load_state_dict(sd_seq)
    for mod in ref_b.modules():
        if isinstance(mod, RefMOELayer):
            orig = mod.forward

            def patched(inp, _orig=orig, **kw):
                kw["apply_on_expert_fn_name"] = \
                    "apply_on_expert_fn_nobatch_torch"
                return _orig(inp, **kw)
            mod.forward = patched

    rng = np.random.default_rng(9)
    n = 16
    o = rng.normal(0, 0.2, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_np = np.concatenate(
        [o, d, np.full((n, 1), 0.1, np.float32),
         np.full((n, 1), 3.0, np.float32)], -1)
    radii_np = np.full((n, 1), 0.02, np.float32)
    idx_np = rng.integers(0, 4, (n,)).astype(np.float32)

    with torch.no_grad():
        ref_res, _ = ref_render_mip(
            nerf=ref_b, rays=torch.tensor(rays_np),
            radii=torch.tensor(radii_np),
            image_indices=torch.tensor(idx_np), hparams=args_b,
            get_depth=True, get_depth_variance=False)
    want_rgb = ref_res["rgb_fine"].numpy()
    want_depth = ref_res["depth_fine"].numpy()

    import jax.numpy as jnp
    from scripts.convert_torch_ckpt import (convert_nerf_moe_state_dict,
                                            unflatten)
    from switch_nerf_tpu.models.nerf_moe import MipNeRFMoE
    from switch_nerf_tpu.render.rendering import RenderConfig
    from switch_nerf_tpu.render.rendering_mip import render_rays_mip
    from switch_nerf_tpu.trainer import make_model_fn

    import jax
    params = jax.tree_util.tree_map(jnp.asarray, unflatten(
        convert_nerf_moe_state_dict({k: v.numpy() for k, v in sd.items()})))
    ours = MipNeRFMoE(
        layer_cfg=dict(graph, expert_num=e), pos_xyz_dim=2, pos_dir_dim=1,
        appearance_dim=4, appearance_count=4, xyz_dim=3,
        batch_prioritized_routing=True, use_moe_external_gate=True,
        use_gate_input_norm=True, train_dispatch="nodrop",
        eval_dispatch="nodrop")
    cfg = RenderConfig(coarse_samples=6, fine_samples=6, perturb=0.0,
                       model_chunk_size=4096, pos_dir_dim=1, use_mip=True,
                       rgb_padding=0.001, weights_resample_padding=0.01,
                       stop_level_grad=True)
    res = render_rays_mip(
        make_model_fn(ours, params), jnp.asarray(rays_np),
        jnp.asarray(radii_np), jnp.asarray(idx_np), cfg, None, train=False,
        get_depth=True)
    np.testing.assert_allclose(np.asarray(res["rgb_fine"]), want_rgb,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res["depth_fine"]), want_depth,
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(res["rgb_coarse"]),
                               ref_res["rgb_coarse"].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_convert_torch_ckpt_cli(tmp_path):
    """End-to-end converter drive: a reference-format .pt checkpoint
    (NeRFMoE state dict, DDP 'module.' prefixes, iteration counter) ->
    scripts/convert_torch_ckpt.py -> loadable by our Runner eval path."""
    import json
    import sys as _sys
    import types
    import torch

    m, e = 16, 4
    graph = {
        "layer_num_main": 3, "sigma_tag": 0, "dir_tag": 1, "color_tag": 2,
        "layers": {
            "xyz": {"in_ch": 15, "h_ch": 0, "out_ch": m, "num": 1,
                    "type": "mlp", "act": "none"},
            "0": {"in_ch": m, "h_ch": m, "out_ch": m, "num": 2,
                  "skips": [1], "init_factor": 1.0, "type": "moe",
                  "act": "relu", "gate_type": "top", "k": 1,
                  "fp32_gate": True, "gate_dim": m},
            "1": {"in_ch": m, "h_ch": 0, "out_ch": m, "num": 1,
                  "type": "mlp", "act": "none"},
            "2": {"in_ch": m + 9 + 4, "h_ch": 0, "out_ch": 8, "num": 1,
                  "type": "mlp", "act": "relu"},
            "sigma": {"in_ch": m, "h_ch": 0, "out_ch": 1, "num": 1,
                      "type": "mlp", "act": "none"},
            "color": {"in_ch": 8, "h_ch": 0, "out_ch": 3, "num": 1,
                      "type": "mlp", "act": "none"},
            "moe_external_gate": {"in_ch": m, "h_ch": m, "out_ch": m,
                                  "num": 2, "type": "mlp", "act": "none"},
            "gate_input_norm": {"in_ch": m, "h_ch": 0, "out_ch": 0,
                                "num": 1, "type": "layernorm"},
        },
    }

    def ref_args():
        return types.SimpleNamespace(
            sh_deg=None, shifted_softplus=True, pos_xyz_dim=2,
            pos_dir_dim=1, appearance_dim=4, affine_appearance=False,
            nerfmoe_class_name="NeRFMoE", model=graph,
            moe_expert_type="expertmlp", moe_expert_num=e,
            moe_capacity_factor=1.0, batch_prioritized_routing=True,
            gate_noise=-1.0, use_load_importance_loss=False,
            compute_balance_loss=False, dispatcher_no_score=False,
            dispatcher_no_postscore=False, use_moe_external_gate=True,
            use_gate_input_norm=True, moe_use_residual=False,
            moe_return_gates=False, moe_return_gate_logits=False,
            use_moe=True, amp_use_bfloat16=False, bf16=False,
            no_expert_parallel=True, moe_local_expert_num=e,
            single_data_group=None, use_fp32_in_moe=False,
            moe_layer_num=1, apply_on_expert_fn_name=None,
            no_feature_mapping_relu=False,
            parallel_env=types.SimpleNamespace(global_rank=0))

    from switch_nerf.models.nerf_moe import get_nerf_moe_inner
    torch.manual_seed(31)
    ref = get_nerf_moe_inner(ref_args(), appearance_count=4, xyz_dim=3)
    sd = {"module." + k: v for k, v in ref.state_dict().items()}
    ckpt_path = tmp_path / "ref.pt"
    torch.save({"model_state_dict": sd, "iteration": 7}, ckpt_path)

    # synthetic scene so Runner can resolve geometry
    root = tmp_path / "scene"
    (root / "train" / "metadata").mkdir(parents=True)
    (root / "train" / "rgbs").mkdir(parents=True)
    (root / "val" / "metadata").mkdir(parents=True)
    (root / "val" / "rgbs").mkdir(parents=True)
    from PIL import Image
    rng = np.random.default_rng(0)
    for split, names in (("train", ["000", "001", "002"]), ("val", ["003"])):
        for name in names:
            c2w = np.eye(3, 4, dtype=np.float32)
            torch.save({"c2w": torch.tensor(c2w), "W": 8, "H": 8,
                        "intrinsics": torch.tensor([10.0, 10.0, 4.0, 4.0])},
                       root / split / "metadata" / f"{name}.pt")
            Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
                            ).save(root / split / "rgbs" / f"{name}.jpg")
    torch.save({"origin_drb": torch.zeros(3), "pose_scale_factor": 1.0},
               root / "coordinates.pt")

    argv = ["convert", "--exp_name", str(tmp_path / "exp"),
            "--dataset_path", str(root),
            "--use_moe", "--use_moe_external_gate", "--use_gate_input_norm",
            "--batch_prioritized_routing", "--moe_expert_num", str(e),
            "--no_bg_nerf", "--pos_xyz_dim", "2", "--pos_dir_dim", "1",
            "--appearance_dim", "4", "--no_amp",
            "--model", json.dumps(graph),
            "--torch_ckpt", str(ckpt_path),
            "--out_ckpt", str(tmp_path / "converted")]
    old_argv = _sys.argv
    _sys.argv = argv
    try:
        from scripts.convert_torch_ckpt import main as conv_main
        conv_main()
    finally:
        _sys.argv = old_argv

    # load the converted checkpoint through the normal path
    from switch_nerf_tpu.checkpoints import latest_checkpoint
    step_dir = latest_checkpoint(tmp_path / "converted")
    assert step_dir is not None and step_dir.name == "7"

    # parity: converted params reproduce the torch forward
    import jax
    import jax.numpy as jnp
    from switch_nerf_tpu.checkpoints import load_checkpoint
    from switch_nerf_tpu.config import get_opts, parse_args
    from switch_nerf_tpu.models.model_utils import get_nerf
    from switch_nerf_tpu.trainer import create_train_state

    h = parse_args(get_opts(), [
        "--exp_name", "e", "--dataset_path", "d",
        "--use_moe", "--use_moe_external_gate", "--use_gate_input_norm",
        "--batch_prioritized_routing", "--moe_expert_num", str(e),
        "--no_bg_nerf", "--pos_xyz_dim", "2", "--pos_dir_dim", "1",
        "--appearance_dim", "4", "--no_amp",
        "--model", json.dumps(graph)])
    h.moe_train_batch = h.moe_test_batch = True
    model = get_nerf(h, appearance_count=4)  # 3 train + 1 val images
    state = create_train_state(jax.random.PRNGKey(0), h, model, None)
    state, _ = load_checkpoint(step_dir, state, restore_rng_states=False)
    assert int(state.step) == 7

    x_np = np.concatenate([
        np.random.default_rng(2).normal(0, 1, (9, 6)).astype(np.float32),
        np.zeros((9, 1), np.float32)], -1)
    ref.eval()
    # torch forward needs the pure-torch strategy -> use weights directly
    # via our parity-checked modules: compare against direct conversion
    from scripts.convert_torch_ckpt import (convert_nerf_moe_state_dict,
                                            unflatten)
    direct = unflatten(convert_nerf_moe_state_dict(
        {k[len("module."):]: v.numpy() for k, v in sd.items()}))
    got = model.apply({"params": state.params["nerf"]}, jnp.asarray(x_np),
                      deterministic=True)["outputs"]
    want = model.apply({"params": direct}, jnp.asarray(x_np),
                       deterministic=True)["outputs"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_bg_fine_sampling_parity():
    """Direct probe of the background fine-pass importance sampling (the
    full-render parity test is weakly sensitive here because untrained
    networks are smooth): bg coarse weights -> fine z-values must match the
    reference's _sample_pdf pipeline exactly, including its
    ascending-bins-with-flipped-weights pairing."""
    import types
    import torch
    from switch_nerf.models.nerf import NeRF as RefNeRF, ShiftedSoftplus
    import switch_nerf.rendering as RR

    torch.manual_seed(1)
    bg_t = RefNeRF(2, 1, 2, [1], 16, 4, False, 5, 3, 4,
                   ShiftedSoftplus()).eval()
    hp = types.SimpleNamespace(
        perturb=0.0, coarse_samples=8, fine_samples=8,
        model_chunk_size=4096, use_cascade=False, sh_deg=None,
        pos_dir_dim=1, white_bkgd=False, use_random_background_color=False,
        use_sigma_noise=False, sigma_noise_std=0.0, use_moe=False,
        bg_use_moe=False, moe_return_gates=False, return_pts=False,
        return_pts_rgb=False, return_pts_alpha=False, return_sigma=False,
        return_alpha=False, use_load_importance_loss=False,
        compute_balance_loss=False, container_path=None,
        train_mega_nerf=None)
    rng = np.random.default_rng(4)
    n = 8
    o = rng.normal(0, 0.2, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    center = np.zeros(3, np.float32)
    radius = np.array([1.2, 1.1, 1.3], np.float32)

    with torch.no_grad():
        bg_z = torch.linspace(0, 1, 4).expand(n, 4)
        pts, dr = RR._depth2pts_outside(
            torch.tensor(o)[:, None], torch.tensor(d)[:, None], bg_z,
            torch.tensor(center), torch.tensor(radius), False, False)
        res = {}
        RR._inference(results=res, typ="coarse", nerf=bg_t,
                      rays_d=torch.tensor(d)[:, None],
                      image_indices=torch.zeros(n, 1, 1), hparams=hp,
                      xyz=pts, z_vals=bg_z,
                      last_delta=1e10 * torch.ones(n, 1),
                      composite_rgb=False, get_depth=False,
                      get_depth_variance=False, get_weights=True,
                      get_bg_lambda=False, flip=True, depth_real=dr,
                      white_bkgd=False)
        z_mid = 0.5 * (bg_z[:, :-1] + bg_z[:, 1:])
        ref_fine = RR._sample_pdf(z_mid, res["weights_coarse"][:, 1:-1], 4,
                                  det=True)

    import jax
    import jax.numpy as jnp
    from scripts.convert_torch_ckpt import (convert_dense_nerf_state_dict,
                                            unflatten)
    from switch_nerf_tpu.models.nerf import NeRF
    from switch_nerf_tpu.ops.volume import (depth2pts_outside, sample_pdf,
                                            volume_render)
    from switch_nerf_tpu.render.rendering import (RenderConfig,
                                                  _inference as our_inf)
    from switch_nerf_tpu.trainer import make_model_fn

    bg = NeRF(pos_xyz_dim=2, pos_dir_dim=1, layers=2, skip_layers=(1,),
              layer_dim=16, appearance_dim=4, appearance_count=5,
              rgb_dim=3, xyz_dim=4)
    bg_p = unflatten(convert_dense_nerf_state_dict(
        {k: v.numpy() for k, v in bg_t.state_dict().items()}))
    cfg = RenderConfig(coarse_samples=8, fine_samples=8, perturb=0.0,
                       model_chunk_size=4096, pos_dir_dim=1)
    bg_z_j = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 4), (n, 4))
    pts_j, dr_j = depth2pts_outside(
        jnp.asarray(o)[:, None], jnp.asarray(d)[:, None], bg_z_j,
        jnp.asarray(center), jnp.asarray(radius))
    rgbs_c, sigmas_c, zv_c, dr_c, _ = our_inf(
        make_model_fn(bg, bg_p), pts_j, bg_z_j,
        jnp.asarray(d)[:, None], jnp.zeros((n,)),
        cfg, None, False, flip=True, depth_real=dr_j)
    vr_c = volume_render(rgbs_c, sigmas_c, zv_c, 1e10 * jnp.ones((n, 1)),
                         flip=True, composite_rgb=False, depth_real=dr_c)
    z_mid_j = jnp.flip(0.5 * (zv_c[:, :-1] + zv_c[:, 1:]), axis=-1)
    our_fine = sample_pdf(z_mid_j,
                          jax.lax.stop_gradient(vr_c.weights[:, 1:-1]),
                          4, det=True, rng=None)
    np.testing.assert_allclose(np.asarray(our_fine), ref_fine.numpy(),
                               atol=1e-6)


def test_load_importance_loss_parity():
    """Our load_importance_loss must equal the reference's exactly —
    including torch's UNBIASED var (ddof=1; review fix: jnp's default
    ddof=0 underestimated the loss by (E-1)/E)."""
    import torch
    from switch_nerf.modules.tutel_moe_ext.tutel_fast_dispatch_nobatch \
        import load_importance_loss as ref_loss

    import jax.numpy as jnp
    from switch_nerf_tpu.ops.routing import load_importance_loss

    rng = np.random.default_rng(0)
    s, e, k, noise = 64, 8, 2, 1.5
    scores = rng.uniform(0.01, 1.0, (s, e)).astype(np.float32)
    scores /= scores.sum(-1, keepdims=True)
    logits = rng.normal(0, 1, (s, e)).astype(np.float32)
    topk = np.sort(logits, axis=-1)[:, -k:][:, ::-1].copy()

    want = float(ref_loss(torch.tensor(scores), torch.tensor(topk), e,
                          noise))
    got = float(load_importance_loss(jnp.asarray(scores), jnp.asarray(topk),
                                     e, noise))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_moe_layer_residual_parity():
    """DeepSpeed-style residual MoE (tutel_moe_layer_nobatch.py:504-505,
    666-672, 778-788): reference MOELayer(use_residual=True) vs our
    MoELayer(use_residual=True) with the converted checkpoint — including
    the new residual_expert/coefficient converter branches."""
    import torch
    from switch_nerf.models.model_utils import convert_to_seqexperts
    from switch_nerf.modules.tutel_moe_ext.tutel_moe_nobatch import moe_layer

    m, e = 16, 4
    torch.manual_seed(21)
    ref = moe_layer(
        gate_type={"type": "top", "k": 1, "fp32_gate": True, "gate_dim": m,
                   "capacity_factor": 1.0, "gate_noise": -1.0,
                   "batch_prioritized_routing": True},
        model_dim=m,
        experts={"type": "expertmlp", "count_per_node": e,
                 "layer_num": 2, "skips": [1], "init_factor": 1.0},
        seeds=(1, 2, 3), scan_expert_func=None, use_residual=True).eval()
    # the zero-init coefficient would blend 50/50 regardless of input;
    # randomize so the test pins the actual softmax blend
    with torch.no_grad():
        ref.coefficient.weight.normal_(0, 0.5)
        ref.coefficient.bias.normal_(0, 0.5)
    sd = {f"layers.0.{k}": v.clone() for k, v in ref.state_dict().items()}

    x = torch.tensor(np.random.default_rng(13).normal(
        0, 1, (64, m)).astype(np.float32))

    # oracle: base MoE via the reference's own seqexperts pure-torch
    # strategy, then the residual blend via the reference's own modules
    # (exactly MOELayer.forward:778-788)
    def strip(k):
        for prefix in ("module.layers.0.", "layers.0."):
            if k.startswith(prefix):
                return k[len(prefix):]
        return k
    base_sd = convert_to_seqexperts(
        {k: v.clone() for k, v in sd.items()
         if ".residual_expert." not in k and ".coefficient." not in k})
    ref_seq = _build_ref_moe("seqexperts").eval()
    ref_seq.load_state_dict({strip(k): v for k, v in base_sd.items()})
    with torch.no_grad():
        base = ref_seq(
            x, gate_input=x,
            apply_on_expert_fn_name="apply_on_expert_fn_nobatch_torch")
        res_out = ref.residual_expert(
            x.reshape(1, 1, -1, m), ref).reshape(-1, m)
        coef = torch.softmax(ref.coefficient(x), dim=-1)
        want = (base * coef[..., 0:1] + res_out * coef[..., 1:]).numpy()

    import jax.numpy as jnp
    from scripts.convert_torch_ckpt import (convert_nerf_moe_state_dict,
                                            unflatten)
    from switch_nerf_tpu.models.moe import MoELayer

    flat = convert_nerf_moe_state_dict({k: v.numpy() for k, v in sd.items()})
    assert "layer_0/residual_expert/w0" in flat
    assert "layer_0/coefficient/kernel" in flat
    params = unflatten(flat)["layer_0"]
    ours = MoELayer(model_dim=m, num_experts=e, layer_num=2, skips=(1,),
                    top_k=1, batch_prioritized_routing=True,
                    use_residual=True,
                    train_dispatch="nodrop", eval_dispatch="nodrop")
    y, _, _ = ours.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-5)


def test_normmlp_parity():
    """NormMlp (reference nerf_moe.py:51-101, graph type 'normmlp'
    :293-295): LayerNorm-before-activation placement, including the
    skip-connection interplay, vs the converted checkpoint."""
    import torch
    from switch_nerf.models.nerf_moe import NormMlp as RefNormMlp

    import jax.numpy as jnp
    from scripts.convert_torch_ckpt import map_mlp, unflatten
    from switch_nerf_tpu.models.mlp import NormMlp

    m = 12
    torch.manual_seed(31)
    ref = RefNormMlp(in_features=m, hidden_features=m, out_features=8,
                     layer_num=4, skips=[1], norm_name="layernorm").eval()
    sd = {f"nm.{k}": v.detach().numpy() for k, v in ref.state_dict().items()}
    flat = {}
    n_fcs = map_mlp(sd, "nm", flat, "nm")
    assert n_fcs == 4 and "nm/norm0/scale" in flat and "nm/norm3/scale" \
        not in flat  # no norm after the last fc (reference :65-72)

    x_np = np.random.default_rng(17).normal(0, 1, (33, m)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x_np)).numpy()
    ours = NormMlp(hidden_features=m, out_features=8, layer_num=4,
                   skips=(1,), norm_name="layernorm")
    got = ours.apply({"params": unflatten(flat)["nm"]}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_moe_layer_top2_parity():
    """Top-2 gating full-layer parity vs the reference (every published
    config uses k=1; the flag surface allows k>1 — this pins the k=2
    two-slot dispatch/combine + aux-loss semantics cross-framework, in
    BOTH dispatch modes)."""
    import torch
    from switch_nerf.models.model_utils import convert_to_seqexperts

    m, e, k = 16, 4, 2
    ref_mlp = _build_ref_moe("expertmlp", seed=41, top_k=k).eval()
    sd = {f"layers.0.{kk}": v.clone()
          for kk, v in ref_mlp.state_dict().items()}

    def strip(kk):
        for prefix in ("module.layers.0.", "layers.0."):
            if kk.startswith(prefix):
                return kk[len(prefix):]
        return kk
    sd_seq = convert_to_seqexperts({kk: v.clone() for kk, v in sd.items()})
    ref_seq = _build_ref_moe("seqexperts", seed=42, top_k=k).eval()
    ref_seq.load_state_dict({strip(kk): v for kk, v in sd_seq.items()})

    # 96 samples over 4 experts: no expert is empty, avoiding the
    # reference torch strategy's empty-expert dummy write into row 0
    # (tutel_moe_layer_nobatch.py:399-403)
    x = torch.tensor(np.random.default_rng(23).normal(
        0, 1, (96, m)).astype(np.float32))
    with torch.no_grad():
        want = ref_seq(
            x, gate_input=x,
            apply_on_expert_fn_name="apply_on_expert_fn_nobatch_torch")
    l_aux_want = float(want.l_aux)
    want = want.numpy()

    import jax.numpy as jnp
    from scripts.convert_torch_ckpt import (convert_nerf_moe_state_dict,
                                            unflatten)
    from switch_nerf_tpu.models.moe import MoELayer

    params = unflatten(convert_nerf_moe_state_dict(
        {kk: v.numpy() for kk, v in sd.items()}))["layer_0"]
    for mode, cf in [("nodrop", 1.0), ("padded", 4.0)]:
        ours = MoELayer(model_dim=m, num_experts=e, layer_num=2, skips=(1,),
                        top_k=k, capacity_factor=cf,
                        batch_prioritized_routing=True,
                        train_dispatch=mode, eval_dispatch=mode)
        y, l_aux, _ = ours.apply({"params": params}, jnp.asarray(x.numpy()))
        np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4,
                                   atol=1e-5, err_msg=mode)
        np.testing.assert_allclose(float(l_aux), l_aux_want, rtol=1e-5)


@pytest.mark.parametrize("margin", [1.15, 1.0])
def test_mega_nerf_parity(margin):
    """MegaNeRF centroid blending vs the reference (mega_nerf.py:7-61):
    boundary-margin-weighted soft blend (margin > 1) and hard argmin
    assignment (margin == 1), through converted dense-NeRF submodules.
    The reference boolean-masks points per cluster; ours evaluates every
    submodule on all points and blends with the sparse weight matrix —
    must be numerically identical."""
    import torch
    from switch_nerf.models.mega_nerf import MegaNeRF as RefMegaNeRF
    from switch_nerf.models.nerf import NeRF as RefNeRF, ShiftedSoftplus

    import jax.numpy as jnp
    from scripts.convert_torch_ckpt import (convert_dense_nerf_state_dict,
                                            unflatten)
    from switch_nerf_tpu.models.mega_nerf import MegaNeRF
    from switch_nerf_tpu.models.nerf import NeRF

    torch.manual_seed(51)
    n_sub = 3
    ref_subs = [RefNeRF(pos_xyz_dim=2, pos_dir_dim=1, layers=2,
                        skip_layers=[], layer_dim=8, appearance_dim=2,
                        affine_appearance=False, appearance_count=3,
                        rgb_dim=3, xyz_dim=3,
                        sigma_activation=ShiftedSoftplus()).eval()
                for _ in range(n_sub)]
    cents = torch.tensor([[0.0, 0.0, 0.0], [0.6, 0.0, 0.0],
                          [0.0, 0.7, 0.0]])
    ref = RefMegaNeRF(ref_subs, cents, boundary_margin=margin,
                      xyz_real=False, cluster_2d=False).eval()

    rng = np.random.default_rng(29)
    n = 40
    x_np = np.concatenate([
        rng.normal(0, 0.6, (n, 6)).astype(np.float32),
        rng.integers(0, 3, (n, 1)).astype(np.float32)], -1)
    with torch.no_grad():
        want = ref(torch.tensor(x_np)).numpy()

    subs = [NeRF(pos_xyz_dim=2, pos_dir_dim=1, layers=2, skip_layers=(),
                 layer_dim=8, appearance_dim=2, appearance_count=3)
            for _ in range(n_sub)]
    ours = MegaNeRF(sub_modules=subs,
                    centroids=tuple(map(tuple, cents.numpy().tolist())),
                    boundary_margin=margin)
    params = {
        f"sub_modules_{i}": unflatten(convert_dense_nerf_state_dict(
            {k: v.detach().numpy() for k, v in sub.state_dict().items()}))
        for i, sub in enumerate(ref_subs)}
    got = ours.apply({"params": params}, jnp.asarray(x_np))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_metrics_parity():
    """psnr/ssim (+ masked variants) vs the reference's own torch
    implementations (metrics.py:8-10, 51-121, 124-129, 131-208 — the
    tf.image.ssim-modeled separable-Gaussian SSIM): the eval-table
    numbers must come from identical formulas."""
    import torch
    from switch_nerf import metrics as ref_metrics

    from switch_nerf_tpu import metrics as M

    rng = np.random.default_rng(61)
    img0 = rng.uniform(0, 1, (24, 17, 3)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape), 0,
                   1).astype(np.float32)
    mask = rng.uniform(size=(24, 17)) > 0.3

    t0, t1 = torch.tensor(img0), torch.tensor(img1)
    tm = torch.tensor(mask)
    np.testing.assert_allclose(float(M.psnr(img0, img1)),
                               ref_metrics.psnr(t0, t1), rtol=1e-5)
    np.testing.assert_allclose(float(M.ssim(img0, img1, 1.0)),
                               ref_metrics.ssim(t0, t1, 1.0), rtol=1e-5)
    np.testing.assert_allclose(float(M.psnr_mask(img0, img1, mask)),
                               ref_metrics.psnr_mask(t0, t1, tm), rtol=1e-5)
    np.testing.assert_allclose(float(M.ssim_mask(img0, img1, 1.0, mask)),
                               ref_metrics.ssim_mask(t0, t1, 1.0, tm),
                               rtol=1e-5)


def test_ray_utils_parity():
    """Ray generation vs the reference (ray_utils.py:6-85): center-pixel
    directions, world rotation, and the altitude-plane near/far truncation
    (drb convention, +x down) — the geometry every training ray passes
    through."""
    import torch
    from switch_nerf.ray_utils import (get_ray_directions as ref_dirs,
                                       get_rays as ref_get_rays)

    from switch_nerf_tpu.datasets import ray_utils as R

    w, h, fx, fy, cx, cy = 9, 7, 11.0, 10.0, 4.2, 3.6
    for center in (True, False):
        want = ref_dirs(w, h, fx, fy, cx, cy, center,
                        torch.device("cpu")).numpy()
        got = R.get_ray_directions(w, h, fx, fy, cx, cy, center)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)

    # a drb camera pose high above the scene looking straight down
    # (camera -z -> world +x = down), so the altitude planes truncate
    rot = np.array([[0.0, 0.0, -1.0],
                    [0.0, 1.0, 0.0],
                    [1.0, 0.0, 0.0]], np.float32)
    c2w = np.concatenate(
        [rot, np.array([[-80.0], [2.0], [3.0]], np.float32)], axis=1)
    dirs = R.get_ray_directions(w, h, fx, fy, cx, cy, True)
    for alt_range in (None, [-60.0, -20.0]):
        want = ref_get_rays(torch.tensor(dirs), torch.tensor(c2w),
                            0.5, 200.0, alt_range).numpy()
        got = R.get_rays(dirs, c2w, 0.5, 200.0, alt_range)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        if alt_range is not None:
            # the truncation actually engaged for some rays
            assert (want[..., 6] > 0.5 + 1e-4).any() or \
                   (want[..., 7] < 200.0 - 1e-4).any()


def test_eval_sh_parity():
    """eval_sh vs the reference's PlenOctree SH polynomials
    (spherical_harmonics.py:55-107), all supported degrees 0..4."""
    import torch
    from switch_nerf.spherical_harmonics import eval_sh as ref_eval_sh

    import jax.numpy as jnp
    from switch_nerf_tpu.ops import eval_sh

    rng = np.random.default_rng(71)
    dirs = rng.normal(size=(25, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    for deg in range(5):
        c = (deg + 1) ** 2
        sh = rng.normal(size=(25, 3, c)).astype(np.float32)
        with torch.no_grad():
            want = ref_eval_sh(deg, torch.tensor(sh),
                               torch.tensor(dirs)).numpy()
        got = eval_sh(deg, jnp.asarray(sh), jnp.asarray(dirs))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5,
                                   atol=1e-6, err_msg=f"deg {deg}")


def _make_llff_scene(tmp_path):
    from PIL import Image as PILImage
    rng = np.random.default_rng(0)
    n, h, w = 6, 12, 16
    (tmp_path / "images").mkdir()
    for i in range(n):
        PILImage.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                           ).save(tmp_path / "images" / f"img{i:03d}.png")
    poses = np.zeros((n, 3, 5), np.float32)
    for i in range(n):
        th = i * 0.1
        rot = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]], np.float32)
        poses[i, :, :3] = rot
        poses[i, :, 3] = [0.1 * i, 0, 0.05 * i]
        poses[i, :, 4] = [h, w, 20.0]
    bds = np.stack([np.full(n, 1.0), np.full(n, 10.0)],
                   -1).astype(np.float32)
    np.save(tmp_path / "poses_bounds.npy",
            np.concatenate([poses.reshape(n, 15), bds], -1))


@pytest.mark.parametrize("spherify", [False, True])
def test_llff_loader_parity(tmp_path, monkeypatch, spherify):
    """load_llff_data vs the reference's LLFF loader (load_llff.py — the
    canonical bmild pose math the reference vendored): images, recentered
    poses, bounds, spiral/spherified render path, and the holdout index
    must be identical. (The reference's `ignoregamma` imageio kwarg
    predates imageio v3; shimmed to the modern API for the comparison.)"""
    import types
    import imageio.v2 as iio2
    from switch_nerf.datasets.nerf_data import load_llff as ref_mod

    from switch_nerf_tpu.datasets.nerf_data.load_llff import load_llff_data

    _make_llff_scene(tmp_path)
    monkeypatch.setattr(
        ref_mod, "imageio",
        types.SimpleNamespace(imread=lambda f, **k: iio2.imread(f)))
    # reference factor=None reads images/ as-is (factor=1 would shell out
    # to mogrify via _minify); ours reads images/ directly at factor=1
    ref = ref_mod.load_llff_data(str(tmp_path), factor=None, recenter=True,
                                 bd_factor=0.75, spherify=spherify)
    ours = load_llff_data(str(tmp_path), factor=1, recenter=True,
                          bd_factor=0.75, spherify=spherify)
    for name, a, b in zip(("images", "poses", "bds", "render_poses",
                           "i_test"), ref, ours):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=1e-5, atol=1e-6, err_msg=name)


@pytest.mark.parametrize("half_res", [False, True])
def test_blender_loader_parity(tmp_path, half_res):
    """load_blender_data vs the reference (load_blender.py): RGBA decode,
    pose_spherical render path, camera intrinsics, split concatenation,
    and the cv2 INTER_AREA half_res resize."""
    import json as _json
    from PIL import Image as PILImage
    from switch_nerf.datasets.nerf_data.load_blender import \
        load_blender_data as ref_load

    from switch_nerf_tpu.datasets.nerf_data.load_blender import \
        load_blender_data

    rng = np.random.default_rng(3)
    h = w = 16
    for split, count in (("train", 3), ("val", 2), ("test", 2)):
        frames = []
        for i in range(count):
            name = f"r_{i}"
            PILImage.fromarray(rng.integers(0, 255, (h, w, 4),
                                            dtype=np.uint8)).save(
                tmp_path / f"{name}.png")
            th = 0.3 * i + (0 if split == "train" else 1)
            c2w = np.eye(4, dtype=np.float64)
            c2w[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                                    [-np.sin(th), 0, np.cos(th)]])
            c2w[:3, 3] = [0.2 * i, 0.1, 2.0]
            frames.append({"file_path": f"./{name}",
                           "transform_matrix": c2w.tolist()})
        (tmp_path / f"transforms_{split}.json").write_text(_json.dumps(
            {"camera_angle_x": 0.8, "frames": frames}))
        # blender layout keeps split images in subdirs named by file_path;
        # the flat ./r_i path above reuses tmp_path for all splits, so give
        # each split distinct frames by copying is unnecessary — the loader
        # only follows file_path.

    ref_imgs, ref_poses, ref_render, ref_hwf, ref_splits = ref_load(
        str(tmp_path), half_res=half_res, testskip=1)
    our_imgs, our_poses, our_render, our_hwf, our_splits = load_blender_data(
        str(tmp_path), half_res=half_res, testskip=1)
    np.testing.assert_allclose(our_imgs, ref_imgs, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(our_poses, ref_poses, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(our_render, np.asarray(ref_render),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(our_hwf, ref_hwf, rtol=1e-6)
    for a, b in zip(our_splits, ref_splits):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("ray_nearfar", ["sphere", "flat"])
def test_bungee_loader_parity(tmp_path, ray_nearfar):
    """Bungee (Google-Earth multiscale) loader vs the reference
    (load_bungee.py:1-89): poses_enu.json parsing, INTER_AREA factor
    resize, earth-sphere/flat-plane per-ray near/far, and mip radii
    from horizontal direction deltas."""
    import torch
    from PIL import Image as PILImage
    from switch_nerf.datasets.nerf_data.load_bungee import (
        get_bungee_nearfar_radii as ref_nearfar,
        load_bungee_multiscale_data as ref_load)

    from switch_nerf_tpu.datasets.nerf_data.load_bungee import (
        get_bungee_nearfar_radii, load_bungee_multiscale_data)

    rng = np.random.default_rng(5)
    n, h, w = 4, 12, 18
    (tmp_path / "images").mkdir()
    for i in range(n):
        PILImage.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                           ).save(tmp_path / "images" / f"im{i:02d}.png")
    poses = np.zeros((n, 3, 5))
    for i in range(n):
        th = 0.2 * i
        poses[i, :, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                                    [-np.sin(th), 0, np.cos(th)]])
        # camera well above the synthetic globe, looking down via get_rays
        poses[i, :, 3] = [10.0 * i, 5.0, 4000.0]
        poses[i, :, 4] = [h, w, 25.0]
    data = {"poses": np.concatenate(
                [poses.reshape(n, 15), np.zeros((n, 2))], -1).tolist(),
            "scene_scale": 2e-4, "scene_origin": [0.0, 0.0, -6371011.0],
            "scale_split": [0, 2]}
    (tmp_path / "poses_enu.json").write_text(__import__("json").dumps(data))

    ref_imgs, ref_poses, ref_scale, ref_origin, ref_split = ref_load(
        str(tmp_path), factor=3)
    our_imgs, our_poses, our_scale, our_origin, our_split = \
        load_bungee_multiscale_data(str(tmp_path), factor=3)
    np.testing.assert_allclose(our_imgs, ref_imgs, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(our_poses, ref_poses, rtol=1e-6)
    assert our_scale == ref_scale and list(our_split) == list(ref_split)
    np.testing.assert_allclose(our_origin, ref_origin)

    # rays [N, H, W, 6] scaled into the scene frame like the reference
    # dataset does; positive-z cameras looking down at the z<=0 globe
    hh, ww = ref_imgs.shape[1:3]
    dirs = np.stack(np.meshgrid(np.arange(ww), np.arange(hh),
                                indexing="xy"), -1).astype(np.float64)
    dirs = np.concatenate([
        (dirs[..., :1] - ww / 2) / 25.0, -(dirs[..., 1:2] - hh / 2) / 25.0,
        -np.ones((hh, ww, 1))], -1)
    rays = []
    for i in range(n):
        rd = dirs @ ref_poses[i, :3, :3].T
        ro = np.broadcast_to(ref_poses[i, :3, 3], rd.shape)
        rays.append(np.concatenate([ro, rd], -1))
    rays = np.stack(rays).astype(np.float32) * 1.0
    rays[..., :3] *= ref_scale

    want_rays, want_radii = ref_nearfar(
        torch.tensor(rays), ref_scale, ref_origin, ray_nearfar)
    got_rays, got_radii = get_bungee_nearfar_radii(
        rays, ref_scale, np.asarray(ref_origin), ray_nearfar)
    assert np.isfinite(np.asarray(got_rays)).all()
    # the sphere intersection subtracts near-equal O(earth-radius) terms;
    # fp32 conditioning wobbles BOTH implementations ~1.6e-4 around the
    # f64 truth (measured: the reference's own f64 run differs from its
    # f32 run by the same magnitude), so the bound reflects that
    np.testing.assert_allclose(np.asarray(got_rays), want_rays.numpy(),
                               rtol=1e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_radii), want_radii.numpy(),
                               rtol=1e-5, atol=1e-8)


def test_classic_ray_utils_parity():
    """Classic-NeRF get_rays + ndc_rays vs the reference
    (nerf_data/ray_utils.py:14-47): the bmild pinhole/NDC math every
    llff/blender ray passes through."""
    import torch
    from switch_nerf.datasets.nerf_data.ray_utils import (
        get_rays as ref_get_rays, ndc_rays as ref_ndc_rays)

    from switch_nerf_tpu.datasets.nerf_data.ray_utils import (get_rays,
                                                              ndc_rays)

    h, w, focal = 10, 14, 22.0
    k = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]],
                 np.float32)
    th = 0.4
    c2w = np.array([[np.cos(th), 0, np.sin(th), 0.3],
                    [0, 1, 0, -0.2],
                    [-np.sin(th), 0, np.cos(th), 1.5]], np.float32)
    want_o, want_d = ref_get_rays(h, w, torch.tensor(k), torch.tensor(c2w))
    got_o, got_d = get_rays(h, w, k, c2w)
    np.testing.assert_allclose(got_o, want_o.numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(got_d, want_d.numpy(), rtol=1e-6, atol=1e-7)

    want_no, want_nd = ref_ndc_rays(h, w, focal, 1.0, want_o.reshape(-1, 3),
                                    want_d.reshape(-1, 3))
    got_no, got_nd = ndc_rays(h, w, focal, 1.0,
                              got_o.reshape(-1, 3), got_d.reshape(-1, 3))
    np.testing.assert_allclose(got_no, want_no.numpy(), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(got_nd, want_nd.numpy(), rtol=1e-5,
                               atol=1e-6)


def test_meters_and_palette_parity():
    """DictAverageMeter semantics (utils/functions.py:52-90) and the VOC
    expert-segmentation palette (:299-305): our single per-key-count meter
    must reproduce BOTH reference meters — the uniform-keys one and the
    asymmetric-keys one — and our algorithmic 256-entry palette must
    extend the reference's hardcoded 21 rows exactly."""
    from switch_nerf.utils.functions import (DictAverageMeter as RefMeter,
                                             DictAverageMeter1 as RefMeter1,
                                             voc_palette as ref_palette)

    from switch_nerf_tpu.utils.meters import DictAverageMeter
    from switch_nerf_tpu.utils.visualize import voc_palette

    np.testing.assert_array_equal(np.asarray(voc_palette())[:21],
                                  np.asarray(ref_palette()))

    # uniform key sets: matches the count-shared reference meter
    seq = [{"psnr": 21.0, "ssim": 0.5}, {"psnr": 25.0, "ssim": 0.7},
           {"psnr": 23.0, "ssim": 0.9}]
    ref, ours = RefMeter(), DictAverageMeter()
    for d in seq:
        ref.update(d)
        ours.update(d)
    for k, v in ref.mean().items():
        assert ours.mean()[k] == pytest.approx(v)

    # asymmetric key sets: matches the per-key-count reference meter
    seq1 = [{"psnr": 20.0}, {"psnr": 30.0, "lpips": 0.2}, {"lpips": 0.4}]
    ref1, ours1 = RefMeter1(), DictAverageMeter()
    for d in seq1:
        ref1.update(d)
        ours1.update(d)
    for k, v in ref1.mean().items():
        assert ours1.mean()[k] == pytest.approx(v)


@pytest.mark.parametrize("half_res,channels", [
    (False, 4),   # the real dataset format ("keep all 4 channels (RGBA)")
    (False, 3),
    (True, 3),    # the reference's half_res buffer is hardcoded 3-channel
    #               (load_LINEMOD.py:85-87) and CRASHES on RGBA input — an
    #               upstream bug, so half_res is only parity-testable on RGB
    (True, 4),    # -> documented-deviation case: ours works, ref raises
])
def test_linemod_loader_parity(tmp_path, half_res, channels):
    """LINEMOD loader vs the reference (load_LINEMOD.py): RGBA frames,
    absolute file_path convention, focal/K from intrinsic_matrix (there is
    no camera_angle_x in this format), pose_spherical render ring,
    floor/ceil cross-split near/far bounds, and the half_res resize.

    Two documented half_res deviations (both places the reference's own
    half_res is broken): ours keeps the source channel count where the
    reference crashes on RGBA, and ours rescales K with focal where the
    reference leaves K stale (rays would target the wrong scene region)."""
    import json as _json
    from PIL import Image as PILImage
    from switch_nerf.datasets.nerf_data.load_LINEMOD import \
        load_LINEMOD_data as ref_load

    from switch_nerf_tpu.datasets.nerf_data.load_LINEMOD import \
        load_LINEMOD_data

    rng = np.random.default_rng(9)
    h = w = 16
    kmat = [[24.0, 0.0, 8.0], [0.0, 24.0, 8.0], [0.0, 0.0, 1.0]]
    for si, (split, count) in enumerate(
            (("train", 3), ("val", 2), ("test", 2))):
        frames = []
        for i in range(count):
            p = tmp_path / f"{split}_{i}.png"
            PILImage.fromarray(rng.integers(0, 255, (h, w, channels),
                                            dtype=np.uint8)).save(p)
            th = 0.25 * i + si
            c2w = np.eye(4)
            c2w[:3, :3] = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                                    [-np.sin(th), 0, np.cos(th)]])
            c2w[:3, 3] = [0.1 * i, 0.2, 1.5]
            frames.append({"file_path": str(p),   # absolute, like the real set
                           "transform_matrix": c2w.tolist(),
                           "intrinsic_matrix": kmat})
        (tmp_path / f"transforms_{split}.json").write_text(_json.dumps(
            {"frames": frames, "near": 0.4 + si, "far": 6.3 - si}))

    ours = load_LINEMOD_data(str(tmp_path), half_res=half_res, testskip=1)
    if half_res and channels == 4:
        # upstream bug: the reference crashes here; ours must not, and
        # must keep all 4 channels through the resize
        with pytest.raises(ValueError):
            ref_load(str(tmp_path), half_res=True, testskip=1)
        assert ours[0].shape[-1] == 4
        assert np.isfinite(ours[0]).all()
        return
    ref = ref_load(str(tmp_path), half_res=half_res, testskip=1)
    names = ("imgs", "poses", "render_poses", "hwf", "K", "i_split",
             "near", "far")
    for name, a, b in zip(names, ref, ours):
        if name == "i_split":
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        elif name == "K" and half_res:
            # documented deviation: ours rescales K with focal; the
            # reference's stale K is the bug
            np.testing.assert_allclose(np.asarray(b, np.float64)[:2],
                                       np.asarray(a, np.float64)[:2] / 2.0)
            np.testing.assert_allclose(np.asarray(b, np.float64)[2],
                                       np.asarray(a, np.float64)[2])
        else:
            np.testing.assert_allclose(
                np.asarray(a, np.float64), np.asarray(b, np.float64),
                rtol=1e-5, atol=1e-6, err_msg=name)


def test_deepvoxels_loader_parity(tmp_path):
    """DeepVoxels loader vs the reference (load_deepvoxels.py): the
    intrinsics.txt resolution rescale, the OpenCV->OpenGL pose-convention
    flip (dir2poses' diag(1,-1,-1,1) — missing from our loader until this
    test), testskip striding, and split concatenation order."""
    from PIL import Image as PILImage
    from switch_nerf.datasets.nerf_data.load_deepvoxels import \
        load_dv_data as ref_load

    from switch_nerf_tpu.datasets.nerf_data.load_deepvoxels import \
        load_dv_data

    rng = np.random.default_rng(11)
    for split, count in (("train", 4), ("validation", 3), ("test", 5)):
        base = tmp_path / split / "cube"
        (base / "rgb").mkdir(parents=True)
        (base / "pose").mkdir()
        for i in range(count):
            PILImage.fromarray(rng.integers(0, 255, (8, 8, 3),
                                            dtype=np.uint8)).save(
                base / "rgb" / f"{i:04d}.png")
            th = 0.3 * i
            pose = np.eye(4)
            pose[:3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                                     [np.sin(th), np.cos(th), 0],
                                     [0, 0, 1]])
            pose[:3, 3] = [0.2 * i, -0.1, 1.0 + 0.05 * i]
            (base / "pose" / f"{i:04d}.txt").write_text(
                " ".join(str(v) for v in pose.reshape(-1)))
        (base / "rgb" / "notes.jpg.bak").write_text("stray non-png")
        (base / "pose" / "readme.md").write_text("stray non-txt")
        (base / "intrinsics.txt").write_text(
            "16.0 4.0 4.5 0.0\n0.0 0.0 0.0\n0.8\n1.0\n8 8\n0\n")

    ref = ref_load(scene="cube", basedir=str(tmp_path), testskip=2)
    ours = load_dv_data(scene="cube", basedir=str(tmp_path), testskip=2)
    for name, a, b in zip(("imgs", "poses", "render_poses", "hwf",
                           "i_split"), ref, ours):
        if name == "i_split":
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        else:
            np.testing.assert_allclose(
                np.asarray(a, np.float64), np.asarray(b, np.float64),
                rtol=1e-5, atol=1e-6, err_msg=name)


def test_visualize_scalars_parity():
    """Depth visualization vs the reference's exact pipeline
    (runner.py:3013 caller log + :3025-3037 visualize_scalars: 5/95
    torch.quantile normalize, inverted INFERNO cv2 colormap) — byte-exact
    on a well-spread depth map."""
    import cv2
    import torch

    from switch_nerf_tpu.utils.visualize import visualize_scalars

    rng = np.random.default_rng(77)
    depths = rng.uniform(0.05, 4.0, (24, 32)).astype(np.float32)

    # the reference composition, verbatim
    t = torch.log(torch.tensor(depths) + 1e-8)
    flat = t.view(-1)
    mi, ma = torch.quantile(flat, 0.05), torch.quantile(flat, 0.95)
    norm = ((t - mi) / max(ma - mi, 1e-8)).clamp_(0, 1)
    want = cv2.cvtColor(
        cv2.applyColorMap(((1 - norm) * 255).byte().numpy(),
                          cv2.COLORMAP_INFERNO), cv2.COLOR_BGR2RGB)

    got = visualize_scalars(depths)
    np.testing.assert_array_equal(got, want)   # byte-exact (measured 0)


def test_dense_nerf_affine_appearance_parity():
    """affine_appearance=True path vs the reference (nerf.py:117-121,
    187-189): appearance embedding -> Linear(appearance_dim, 12) -> 3x4
    affine color transform, with the dir branch excluding the embedding."""
    import torch
    from switch_nerf.models.nerf import NeRF as RefNeRF, ShiftedSoftplus

    import jax.numpy as jnp
    from scripts.convert_torch_ckpt import (convert_dense_nerf_state_dict,
                                            unflatten)
    from switch_nerf_tpu.models.nerf import NeRF

    torch.manual_seed(81)
    ref = RefNeRF(pos_xyz_dim=4, pos_dir_dim=2, layers=3, skip_layers=[1],
                  layer_dim=24, appearance_dim=6, affine_appearance=True,
                  appearance_count=5, rgb_dim=3, xyz_dim=3,
                  sigma_activation=ShiftedSoftplus()).eval()
    n = 21
    x_np = np.concatenate([
        np.random.default_rng(2).normal(0, 1, (n, 6)).astype(np.float32),
        np.random.default_rng(3).integers(0, 5, (n, 1)).astype(np.float32),
    ], -1)
    with torch.no_grad():
        want = ref(torch.tensor(x_np)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = unflatten(convert_dense_nerf_state_dict(sd))
    ours = NeRF(pos_xyz_dim=4, pos_dir_dim=2, layers=3, skip_layers=(1,),
                layer_dim=24, appearance_dim=6, affine_appearance=True,
                appearance_count=5, rgb_dim=3, xyz_dim=3)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x_np)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_graph_wiring_stress_parity():
    """Graph-builder wiring beyond the published topology: a normmlp
    trunk layer, TWO MoE layers at non-zero tags, and sigma/dir taps
    moved deeper — full-graph parity vs the torch reference through
    convert_to_seqexperts2 (the reference's own multi-MoE eval
    migration, model_utils.py:50-68)."""
    import types
    import torch

    m, e = 16, 4
    graph = {
        "layer_num_main": 4, "sigma_tag": 2, "dir_tag": 2, "color_tag": 3,
        "layers": {
            "xyz": {"in_ch": 15, "h_ch": 0, "out_ch": m, "num": 1,
                    "type": "mlp", "act": "none"},
            "0": {"in_ch": m, "h_ch": m, "out_ch": m, "num": 2,
                  "type": "normmlp", "norm_name": "layernorm",
                  "act": "relu"},
            "1": {"in_ch": m, "h_ch": m, "out_ch": m, "num": 2,
                  "skips": [1], "init_factor": 1.0, "type": "moe",
                  "act": "relu", "gate_type": "top", "k": 1,
                  "fp32_gate": True, "gate_dim": m},
            "2": {"in_ch": m, "h_ch": m, "out_ch": m, "num": 2,
                  "skips": [0], "init_factor": 1.0, "type": "moe",
                  "act": "relu", "gate_type": "top", "k": 1,
                  "fp32_gate": True, "gate_dim": m},
            "3": {"in_ch": m + 9 + 4, "h_ch": 0, "out_ch": 8, "num": 1,
                  "type": "mlp", "act": "relu"},
            "sigma": {"in_ch": m, "h_ch": 0, "out_ch": 1, "num": 1,
                      "type": "mlp", "act": "none"},
            "color": {"in_ch": 8, "h_ch": 0, "out_ch": 3, "num": 1,
                      "type": "mlp", "act": "none"},
            "moe_external_gate": {"in_ch": m, "h_ch": m, "out_ch": m,
                                  "num": 2, "type": "mlp", "act": "none"},
            "gate_input_norm": {"in_ch": m, "h_ch": 0, "out_ch": 0,
                                "num": 1, "type": "layernorm"},
        },
    }

    def ref_args(expert_type):
        return types.SimpleNamespace(
            sh_deg=None, shifted_softplus=True, pos_xyz_dim=2,
            pos_dir_dim=1, appearance_dim=4, affine_appearance=False,
            nerfmoe_class_name="NeRFMoE", model=graph,
            moe_expert_type=expert_type, moe_expert_num=e,
            moe_capacity_factor=1.0, batch_prioritized_routing=True,
            gate_noise=-1.0, use_load_importance_loss=False,
            compute_balance_loss=False, dispatcher_no_score=False,
            dispatcher_no_postscore=False, use_moe_external_gate=True,
            use_gate_input_norm=True, moe_use_residual=False,
            moe_return_gates=False, moe_return_gate_logits=False,
            use_moe=True, amp_use_bfloat16=False, bf16=False,
            no_expert_parallel=True, moe_local_expert_num=e,
            single_data_group=None, use_fp32_in_moe=False,
            moe_layer_num=2, apply_on_expert_fn_name=None,
            no_feature_mapping_relu=False,
            parallel_env=types.SimpleNamespace(global_rank=0),
        )

    from switch_nerf.models.model_utils import convert_to_seqexperts2
    from switch_nerf.models.nerf_moe import get_nerf_moe_inner
    from switch_nerf.modules.tutel_moe_ext.tutel_moe_layer_nobatch import \
        MOELayer as RefMOELayer

    torch.manual_seed(91)
    ref_a = get_nerf_moe_inner(ref_args("expertmlp"), appearance_count=4,
                               xyz_dim=3).eval()
    sd = {k: v.clone() for k, v in ref_a.state_dict().items()}

    sd_seq = convert_to_seqexperts2({k: v.clone() for k, v in sd.items()},
                                    [1, 2])
    sd_seq = {(k[len("module."):] if k.startswith("module.") else k): v
              for k, v in sd_seq.items()}
    torch.manual_seed(92)
    ref_b = get_nerf_moe_inner(ref_args("seqexperts"), appearance_count=4,
                               xyz_dim=3).eval()
    ref_b.load_state_dict(sd_seq)
    for mod in ref_b.modules():
        if isinstance(mod, RefMOELayer):
            orig = mod.forward

            def patched(inp, _orig=orig, **kw):
                kw["apply_on_expert_fn_name"] = \
                    "apply_on_expert_fn_nobatch_torch"
                return _orig(inp, **kw)
            mod.forward = patched

    rng = np.random.default_rng(15)
    n = 49
    x_np = np.concatenate([
        rng.normal(0, 1, (n, 6)).astype(np.float32),
        rng.integers(0, 4, (n, 1)).astype(np.float32)], -1)
    with torch.no_grad():
        want = ref_b(torch.tensor(x_np))["outputs"].numpy()

    import jax.numpy as jnp
    from scripts.convert_torch_ckpt import (convert_nerf_moe_state_dict,
                                            unflatten)
    from switch_nerf_tpu.models.nerf_moe import NeRFMoE

    params = unflatten(convert_nerf_moe_state_dict(
        {k: v.numpy() for k, v in sd.items()}))
    ours = NeRFMoE(
        layer_cfg=dict(graph, expert_num=e), pos_xyz_dim=2, pos_dir_dim=1,
        appearance_dim=4, appearance_count=4, xyz_dim=3,
        batch_prioritized_routing=True, use_moe_external_gate=True,
        use_gate_input_norm=True, train_dispatch="nodrop",
        eval_dispatch="nodrop")
    got = ours.apply({"params": params}, jnp.asarray(x_np),
                     deterministic=True)["outputs"]
    # top-1 argmax sits on a knife edge for tokens whose two best gate
    # logits differ by ~fp32 eps; different-but-valid fp32 reduction
    # orders can route such a token to the other expert (the same flip
    # happens between torch CPU and CUDA). Allow at most 2/49 such rows;
    # all other rows must match to fp32 tolerance.
    # same predicate as the assert below, so a row either counts as a
    # boundary flip or passes the strict check — no gap between thresholds
    row_ok = (np.abs(np.asarray(got) - want) <= 1e-5 + 1e-4 * np.abs(want)
              ).all(axis=1)
    assert row_ok.sum() >= want.shape[0] - 2, \
        f"{(~row_ok).sum()} rows diverge (want <= 2 boundary flips)"
    np.testing.assert_allclose(np.asarray(got)[row_ok], want[row_ok],
                               rtol=1e-4, atol=1e-5)
