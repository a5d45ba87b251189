"""Whole-eval-stack cross-framework pin (round-3 verdict item 2).

One tiny synthetic Mega-NeRF scene + ONE reference-format checkpoint; the
REFERENCE's `_run_validation_image` (imported torch runner, stubs as in
test_reference_parity) and our `eval_image` both run end-to-end —
rays -> whole-image render -> right-half crop -> psnr/ssim -> per-image
metrics_{i}.txt + gt/pred/depth crop files — and the final numbers must
agree. This covers the seams the per-component parity pins (models,
render_rays, metrics formulas) individually cannot: ray generation from
metadata, image chunking, crop protocol, file layout, and aggregation.

Reference: /root/reference/switch_nerf/runner.py:1406-1607.
"""
import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.reference_stubs import install_runner_stubs, reference_available

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="/root/reference not mounted")

M = 16
E = 4
GRAPH = {
    "layer_num_main": 3, "sigma_tag": 0, "dir_tag": 1, "color_tag": 2,
    "layers": {
        "xyz": {"in_ch": 15, "h_ch": 0, "out_ch": M, "num": 1,
                "type": "mlp", "act": "none"},
        "0": {"in_ch": M, "h_ch": M, "out_ch": M, "num": 2,
              "skips": [1], "init_factor": 1.0, "type": "moe",
              "act": "relu", "gate_type": "top", "k": 1,
              "fp32_gate": True, "gate_dim": M},
        "1": {"in_ch": M, "h_ch": 0, "out_ch": M, "num": 1,
              "type": "mlp", "act": "none"},
        "2": {"in_ch": M + 9 + 4, "h_ch": 0, "out_ch": 8, "num": 1,
              "type": "mlp", "act": "relu"},
        "sigma": {"in_ch": M, "h_ch": 0, "out_ch": 1, "num": 1,
                  "type": "mlp", "act": "none"},
        "color": {"in_ch": 8, "h_ch": 0, "out_ch": 3, "num": 1,
                  "type": "mlp", "act": "none"},
        "moe_external_gate": {"in_ch": M, "h_ch": M, "out_ch": M,
                              "num": 2, "type": "mlp", "act": "none"},
        "gate_input_norm": {"in_ch": M, "h_ch": 0, "out_ch": 0,
                            "num": 1, "type": "layernorm"},
    },
}


def _ref_args():
    return types.SimpleNamespace(
        sh_deg=None, shifted_softplus=True, pos_xyz_dim=2,
        pos_dir_dim=1, appearance_dim=4, affine_appearance=False,
        nerfmoe_class_name="NeRFMoE", model=GRAPH,
        moe_expert_type="expertmlp", moe_expert_num=E,
        moe_capacity_factor=1.0, batch_prioritized_routing=True,
        gate_noise=-1.0, use_load_importance_loss=False,
        compute_balance_loss=False, dispatcher_no_score=False,
        dispatcher_no_postscore=False, use_moe_external_gate=True,
        use_gate_input_norm=True, moe_use_residual=False,
        moe_return_gates=False, moe_return_gate_logits=False,
        use_moe=True, amp_use_bfloat16=False, bf16=False,
        no_expert_parallel=True, moe_local_expert_num=E,
        single_data_group=None, use_fp32_in_moe=False,
        moe_layer_num=1, apply_on_expert_fn_name=None,
        no_feature_mapping_relu=False,
        parallel_env=types.SimpleNamespace(global_rank=0))


def _write_scene(root, rng):
    import torch
    from PIL import Image
    w, h = 16, 12
    for split, names in (("train", ["000", "001"]), ("val", ["002"])):
        (root / split / "metadata").mkdir(parents=True)
        (root / split / "rgbs").mkdir(parents=True)
        for name in names:
            c2w = np.eye(3, 4, dtype=np.float32)
            c2w[:, 3] = rng.normal(0, 0.1, 3).astype(np.float32)
            c2w[2, 3] -= 0.4
            torch.save({"c2w": torch.tensor(c2w), "W": w, "H": h,
                        "intrinsics": torch.tensor(
                            [14.0, 14.0, w / 2.0, h / 2.0])},
                       root / split / "metadata" / f"{name}.pt")
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            Image.fromarray(img).save(root / split / "rgbs" / f"{name}.jpg")
    torch.save({"origin_drb": torch.zeros(3), "pose_scale_factor": 1.0},
               root / "coordinates.pt")


def test_whole_eval_stack_cross_framework(tmp_path, monkeypatch):
    install_runner_stubs()
    import torch

    # ---- one reference-format checkpoint --------------------------------
    from switch_nerf.models.model_utils import convert_to_seqexperts
    from switch_nerf.models.nerf_moe import get_nerf_moe_inner
    torch.manual_seed(77)
    train_model = get_nerf_moe_inner(_ref_args(), appearance_count=3,
                                     xyz_dim=3).eval()
    sd = {"module." + k: v for k, v in train_model.state_dict().items()}
    ckpt_pt = tmp_path / "ref.pt"
    torch.save({"model_state_dict": sd, "iteration": 5}, ckpt_pt)

    # the reference's own eval migration (--expertmlp2seqexperts,
    # model_utils.py:136-151): the kernel-free torch dispatch strategy
    # runs on per-expert Linears
    sd_seq = convert_to_seqexperts(
        {k: v.clone() for k, v in sd.items()})
    sd_seq = {(k[len("module."):] if k.startswith("module.") else k): v
              for k, v in sd_seq.items()}
    args_seq = _ref_args()
    args_seq.moe_expert_type = "seqexperts"
    torch.manual_seed(78)
    ref_model = get_nerf_moe_inner(args_seq, appearance_count=3,
                                   xyz_dim=3).eval()
    ref_model.load_state_dict(sd_seq)

    root = tmp_path / "scene"
    _write_scene(root, np.random.default_rng(6))

    # ---- OUR side: convert ckpt, run eval_image -------------------------
    monkeypatch.setenv("SWITCH_NERF_LPIPS_SUBSTITUTE", "0")  # match fields
    common = ["--use_moe", "--use_moe_external_gate", "--use_gate_input_norm",
              "--batch_prioritized_routing", "--moe_expert_num", str(E),
              "--no_bg_nerf", "--pos_xyz_dim", "2", "--pos_dir_dim", "1",
              "--appearance_dim", "4", "--no_amp",
              "--model", json.dumps(GRAPH)]
    argv = (["convert", "--exp_name", str(tmp_path / "conv_exp"),
             "--dataset_path", str(root)] + common
            + ["--torch_ckpt", str(ckpt_pt),
               "--out_ckpt", str(tmp_path / "converted")])
    monkeypatch.setattr(sys, "argv", argv)
    from scripts.convert_torch_ckpt import main as conv_main
    conv_main()

    from switch_nerf_tpu.config import get_opts, parse_args
    from switch_nerf_tpu.runner import Runner
    h = parse_args(get_opts(), [
        "--exp_name", str(tmp_path / "ours_exp"),
        "--dataset_path", str(root)] + common)
    h.dataset_type = "memory"
    h.near, h.far = 0.5, 4.0
    h.train_scale_factor = 1
    h.val_scale_factor = 1
    h.coarse_samples = 8
    h.fine_samples = 8
    h.model_chunk_size = 2048
    h.image_pixel_batch_size = 64
    # the reference's pure-torch strategy == our nodrop dispatch; select
    # it through the reference's own strategy-name flag (newly wired)
    h.apply_on_expert_fn_name = "apply_on_expert_fn_nobatch_torch"
    h.ckpt_path = str(tmp_path / "converted" / "5")
    ours_runner = Runner(h)
    assert ours_runner.appearance_count == 3
    our_means = ours_runner.eval_image()
    our_images = ours_runner.experiment_path / "images"
    our_txt = dict(
        line.split(": ") for line in
        (our_images / "metrics_0.txt").read_text().splitlines() if line)

    # ---- REFERENCE side: _run_validation_image on the same scene --------
    import switch_nerf.runner as RR

    # cpu torch: neutralize the cuda memory probes; lpips pkg is absent
    monkeypatch.setattr(RR.torch.cuda, "reset_peak_memory_stats",
                        lambda *a, **k: None)
    monkeypatch.setattr(RR.torch.cuda, "max_memory_allocated",
                        lambda *a, **k: 0)
    monkeypatch.setattr(RR, "lpips", lambda *a, **k: {})

    # kernel-free MoE strategy (as in test_full_nerfmoe_graph_parity)
    from switch_nerf.modules.tutel_moe_ext.tutel_moe_layer_nobatch import \
        MOELayer as RefMOELayer
    for mod in ref_model.modules():
        if isinstance(mod, RefMOELayer):
            orig = mod.forward

            def patched(inp, _orig=orig, **kw):
                kw["apply_on_expert_fn_name"] = \
                    "apply_on_expert_fn_nobatch_torch"
                return _orig(inp, **kw)
            mod.forward = patched

    class FakeWriter:
        def add_scalar(self, *a, **k):
            pass

        def add_image(self, *a, **k):
            pass

        def flush(self):
            pass

        def close(self):
            pass

    hp_ref = types.SimpleNamespace(
        # render_rays surface (test_render_rays_parity) + eval surface
        perturb=0.0, coarse_samples=8, fine_samples=8,
        model_chunk_size=2048, use_cascade=False, sh_deg=None,
        pos_dir_dim=1, white_bkgd=False, use_random_background_color=False,
        use_sigma_noise=False, sigma_noise_std=0.0, use_moe=True,
        bg_use_moe=False, moe_return_gates=False, return_pts=False,
        return_pts_rgb=False, return_pts_alpha=False, return_sigma=False,
        return_alpha=False, use_load_importance_loss=False,
        compute_balance_loss=False, container_path=None,
        train_mega_nerf=None,
        render_image_fn_name=None, bg_nerf=False, center_pixels=True,
        appearance_dim=4, amp=False, amp_use_bfloat16=False,
        image_pixel_batch_size=64)

    from switch_nerf.image_metadata import ImageMetadata as RefMetadata
    vi = ours_runner.val_items[0]
    ref_item = RefMetadata(
        Path(vi.image_path), torch.tensor(np.asarray(vi.c2w)),
        vi.W, vi.H, torch.tensor(np.asarray(vi.intrinsics)),
        int(vi.image_index), None, True)

    r = RR.Runner.__new__(RR.Runner)
    r.hparams = hp_ref
    r.device = torch.device("cpu")
    r.near = float(ours_runner.near)
    r.far = float(ours_runner.far)
    r.ray_altitude_range = None
    r.sphere_center = None
    r.sphere_radius = None
    r.nerf = ref_model
    r.bg_nerf = None
    r.val_items = [ref_item]
    r.writer = FakeWriter()
    r.is_master = True
    ref_exp = tmp_path / "ref_exp"
    ref_exp.mkdir()
    r.experiment_path = ref_exp

    with torch.no_grad():
        ref_metrics = RR.Runner._run_validation_image(r, 0)

    ref_images = ref_exp / "images"
    ref_txt = dict(
        line.split(": ") for line in
        (ref_images / "metrics_0.txt").read_text().splitlines() if line)

    # ---- the pin ---------------------------------------------------------
    # identical metrics field sets (psnr, ssim, time, memory — lpips
    # removed on both sides: package absent there, substitute disabled
    # here so numbers can't silently diverge in provenance)
    assert set(ref_txt) == set(our_txt) == {"psnr", "ssim", "time",
                                            "memory"}
    assert float(our_txt["psnr"]) == pytest.approx(
        float(ref_txt["psnr"]), abs=0.05)
    assert float(our_txt["ssim"]) == pytest.approx(
        float(ref_txt["ssim"]), abs=2e-3)
    # aggregate means agree too (reference returns running sums over the
    # 1-image val set; ours returns per-image means)
    assert our_means["psnr"] == pytest.approx(
        float(ref_metrics["val/psnr"]), abs=0.05)

    # identical per-image FILE LISTING in the eval images dir
    ref_files = sorted(p.name for p in ref_images.iterdir())
    our_files = sorted(p.name for p in our_images.iterdir())
    assert ref_files == our_files == [
        "0_depth.jpg", "0_gt.jpg", "0_pred.jpg", "metrics_0.txt"]


def test_whole_eval_stack_cross_framework_nerf(tmp_path, monkeypatch):
    """Classic-NeRF twin: the REFERENCE's `_run_validation_nerf`
    (runner.py:2205-2430 — NeRFDatasetTest items, FULL-image psnr/ssim,
    img_i-keyed files, 'step {i} {mode}' metrics.txt summary divided by
    len(dataset)) and our `eval_nerf` run end-to-end on the SAME blender
    scene (each side through its OWN loader) and one converted
    checkpoint. The reference again needs the RANK branch (its non-RANK
    `metric_path` is unbound — NameError) with world_size 1.
    """
    install_runner_stubs()
    import torch

    from tests.test_nerf_path_e2e import write_blender_scene

    (tmp_path / "scene_root").mkdir()
    root = write_blender_scene(tmp_path / "scene_root")

    # appearance-free graph (classic path: get_nerf(hparams, 0), no
    # appearance embedding — reference runner.py:459)
    graph = json.loads(json.dumps(GRAPH))
    graph["layers"]["2"]["in_ch"] = M + 9

    # ---- one reference-format checkpoint ----------------------------------
    from switch_nerf.models.model_utils import convert_to_seqexperts
    from switch_nerf.models.nerf_moe import get_nerf_moe_inner
    args_t = _ref_args()
    args_t.appearance_dim = 0
    args_t.model = graph
    torch.manual_seed(277)
    train_model = get_nerf_moe_inner(args_t, appearance_count=0,
                                     xyz_dim=3).eval()
    sd = {k: v for k, v in train_model.state_dict().items()}

    sd_seq = convert_to_seqexperts(
        {"module." + k: v.clone() for k, v in sd.items()})
    sd_seq = {(k[len("module."):] if k.startswith("module.") else k): v
              for k, v in sd_seq.items()}
    args_seq = _ref_args()
    args_seq.appearance_dim = 0
    args_seq.model = graph
    args_seq.moe_expert_type = "seqexperts"
    torch.manual_seed(278)
    ref_model = get_nerf_moe_inner(args_seq, appearance_count=0,
                                   xyz_dim=3).eval()
    ref_model.load_state_dict(sd_seq)

    # ---- OUR side: convert params, save ckpt, run eval_nerf ----------------
    monkeypatch.setenv("SWITCH_NERF_LPIPS_SUBSTITUTE", "0")
    from scripts.convert_torch_ckpt import (_merge,
                                            convert_nerf_moe_state_dict,
                                            unflatten)
    from switch_nerf_tpu.checkpoints import save_checkpoint
    from switch_nerf_tpu.config import get_opts_nerf, parse_args
    from switch_nerf_tpu.runner import Runner
    from switch_nerf_tpu.trainer import create_train_state

    def hparams(exp):
        h = parse_args(get_opts_nerf(), [
            "--exp_name", str(tmp_path / exp),
            "--dataset_path", str(root)])
        h.data_type = "nerf"
        h.dataset_type = "blender"
        h.no_ndc = True
        h.testskip = 1
        h.bg_nerf = False
        h.appearance_dim = 0
        h.use_moe = True
        h.use_moe_external_gate = True
        h.use_gate_input_norm = True
        h.batch_prioritized_routing = True
        h.moe_expert_num = E
        h.model = graph
        h.pos_xyz_dim = 2
        h.pos_dir_dim = 1
        h.coarse_samples = 8
        h.fine_samples = 8
        h.model_chunk_size = 2048
        h.image_pixel_batch_size = 64
        h.amp = False
        # reference pure-torch strategy == our nodrop dispatch
        h.apply_on_expert_fn_name = "apply_on_expert_fn_nobatch_torch"
        return h

    h = hparams("conv_exp")
    conv_runner = Runner(h, set_experiment_path=False)
    state = create_train_state(conv_runner.init_rng, h, conv_runner.nerf,
                               conv_runner.bg_nerf)
    conv = unflatten(convert_nerf_moe_state_dict(
        {k: v.numpy() for k, v in sd.items()}))
    params = dict(state.params)
    params["nerf"] = _merge(state.params["nerf"], conv, "nerf")
    state = state.replace(params=params)
    ckpt_dir = save_checkpoint(str(tmp_path / "converted"), state)

    h2 = hparams("ours_exp")
    h2.ckpt_path = str(ckpt_dir)
    ours_runner = Runner(h2)
    our_means = ours_runner.eval_nerf()
    our_dir = ours_runner.experiment_path / "test_images_0"

    # ---- REFERENCE side: _run_validation_nerf(mode="test") -----------------
    import switch_nerf.runner as RR

    monkeypatch.setattr(RR.torch.cuda, "reset_peak_memory_stats",
                        lambda *a, **k: None)
    monkeypatch.setattr(RR.torch.cuda, "max_memory_allocated",
                        lambda *a, **k: 0)
    monkeypatch.setattr(RR, "lpips", lambda *a, **k: {})
    monkeypatch.setenv("RANK", "0")
    monkeypatch.setenv("WORLD_SIZE", "1")
    monkeypatch.setenv("TORCHELASTIC_RUN_ID", "pin")
    monkeypatch.setattr(torch.distributed, "barrier",
                        lambda *a, **k: None, raising=False)
    monkeypatch.setattr(torch.distributed, "broadcast_object_list",
                        lambda *a, **k: None, raising=False)

    from switch_nerf.modules.tutel_moe_ext.tutel_moe_layer_nobatch import \
        MOELayer as RefMOELayer
    for mod in ref_model.modules():
        if isinstance(mod, RefMOELayer):
            orig = mod.forward

            def patched(inp, _orig=orig, **kw):
                kw["apply_on_expert_fn_name"] = \
                    "apply_on_expert_fn_nobatch_torch"
                return _orig(inp, **kw)
            mod.forward = patched

    class DDPish(torch.nn.Module):
        def __init__(self, m):
            super().__init__()
            self.module = m

    class FakeWriter:
        def add_scalar(self, *a, **k):
            pass

        def add_image(self, *a, **k):
            pass

        def flush(self):
            pass

        def close(self):
            pass

    # the reference's own loader builds its val/test datasets
    from switch_nerf.datasets.nerf_data.nerf_loader import (NeRFDataset,
                                                            NeRFDatasetTest,
                                                            NeRFDatasetVal)
    ds_args = types.SimpleNamespace(
        logger=None, dataset_type="blender", datadir=str(root),
        factor=None, spherify=False, llffhold=8, no_ndc=True,
        half_res=False, testskip=1, white_bkgd=False, scale_factor=1,
        bungee_ray_nearfar=None)
    ref_ds = NeRFDataset(ds_args)

    hp_ref = types.SimpleNamespace(
        perturb=0.0, coarse_samples=8, fine_samples=8,
        model_chunk_size=2048, use_cascade=False, sh_deg=None,
        pos_dir_dim=1, white_bkgd=False, use_random_background_color=False,
        use_sigma_noise=False, sigma_noise_std=0.0, use_moe=True,
        bg_use_moe=False, moe_return_gates=False, return_pts=False,
        return_pts_rgb=False, return_pts_alpha=False, return_sigma=False,
        return_alpha=False, use_load_importance_loss=False,
        compute_balance_loss=False, container_path=None,
        train_mega_nerf=None, render_image_fn_name=None, bg_nerf=False,
        center_pixels=True, appearance_dim=0, amp=False,
        amp_use_bfloat16=False, image_pixel_batch_size=64,
        use_mip=False, colormap=4)

    r = RR.Runner.__new__(RR.Runner)
    r.hparams = hp_ref
    r.device = torch.device("cpu")
    r.near, r.far = float(ref_ds.near), float(ref_ds.far)
    r.ray_altitude_range = None
    r.sphere_center = None
    r.sphere_radius = None
    r.nerf = DDPish(ref_model)
    r.bg_nerf = None
    r.val_dataset = NeRFDatasetVal(ref_ds)
    r.test_dataset = NeRFDatasetTest(ref_ds)
    r.writer = FakeWriter()
    r.is_master = True
    ref_exp = tmp_path / "ref_exp"
    ref_exp.mkdir()
    r.experiment_path = ref_exp

    ref_metrics = RR.Runner._run_validation_nerf(r, 0, mode="test")
    ref_dir = ref_exp / "test_images_0"

    # ---- the pin ----------------------------------------------------------
    # identical file listing of the protocol dir (img_i-keyed: the global
    # blender i_test indices 6, 7 — NOT the split-local 0, 1)
    ref_files = sorted(p.name for p in ref_dir.iterdir())
    our_files = sorted(p.name for p in our_dir.iterdir())
    assert ref_files == our_files == [
        "6_depth.jpg", "6_gt.jpg", "6_pred.jpg",
        "7_depth.jpg", "7_gt.jpg", "7_pred.jpg",
        "metrics.txt", "metrics_6.txt", "metrics_7.txt"]

    for img_i in (6, 7):
        ref_lines = [line.split(": ") for line in
                     (ref_dir / f"metrics_{img_i}.txt"
                      ).read_text().splitlines() if line]
        our_lines = [line.split(": ") for line in
                     (our_dir / f"metrics_{img_i}.txt"
                      ).read_text().splitlines() if line]
        assert [k for k, _ in ref_lines] == [k for k, _ in our_lines] \
            == ["psnr", "ssim", "time", "memory"]
        ref_txt, our_txt = dict(ref_lines), dict(our_lines)
        assert float(our_txt["psnr"]) == pytest.approx(
            float(ref_txt["psnr"]), abs=0.05), img_i
        assert float(our_txt["ssim"]) == pytest.approx(
            float(ref_txt["ssim"]), abs=2e-3), img_i

    # summary: 'step 0 test' header + Average test/... sums / len(dataset)
    ref_sum_lines = (ref_dir / "metrics.txt").read_text().splitlines()
    our_sum_lines = (our_dir / "metrics.txt").read_text().splitlines()
    assert ref_sum_lines[0] == our_sum_lines[0] == "step 0 test"

    def to_dict(lines):
        out = {}
        for line in lines[1:]:
            k, v = line.split(": ")
            assert k.startswith("Average ")
            out[k[len("Average "):]] = float(v)
        return out

    ref_sum, our_sum = to_dict(ref_sum_lines), to_dict(our_sum_lines)
    assert set(ref_sum) == set(our_sum) == {
        "test/psnr", "test/ssim", "test/time", "test/memory"}
    assert our_sum["test/psnr"] == pytest.approx(ref_sum["test/psnr"],
                                                 abs=0.05)
    assert our_sum["test/ssim"] == pytest.approx(ref_sum["test/ssim"],
                                                 abs=2e-3)
    assert our_means["psnr"] == pytest.approx(
        float(ref_metrics["test/psnr"]) / len(r.test_dataset), abs=0.05)


def test_whole_eval_stack_cross_framework_blocknerf(tmp_path, monkeypatch):
    """Block-NeRF twin of the pin above: the REFERENCE's
    `_run_validation_image_blocknerf` (runner.py:1610-1869 — tfrecord val
    set, mip render with radii, RIGHT-half crops, masked metrics,
    hash-keyed files, val_image_num-divided summary) and our
    `eval_image_blocknerf` run end-to-end on the SAME synthetic tfrecords
    and ONE converted checkpoint, and the final numbers/files must agree.

    The reference's single-process branch is unreachable (its `image_path`
    is unbound without RANK — NameError), so the torch side runs the RANK
    branch with world_size 1 and no-op collectives, exactly what
    `torch.distributed.launch --nproc_per_node=1` produces.
    """
    install_runner_stubs()
    pytest.importorskip("tensorflow")
    import torch

    from tests.test_blocknerf_e2e import _write_record

    # ---- shared scene: tfrecords + hash->appearance-id map ---------------
    root = tmp_path / "data"
    root.mkdir()
    _write_record(root / "train0.tfrecord", [100], 8, 12, False)
    _write_record(root / "validation0.tfrecord", [300], 16, 24, True, seed=3)
    (root / "train.txt").write_text("train0.tfrecord\n")
    (root / "val.txt").write_text("validation0.tfrecord\n")
    (root / "idmap.json").write_text(json.dumps({
        "val_image_num": 1,
        "train0.tfrecord": {"100": 0},
        "validation0.tfrecord": {"300": 1},
    }))

    # ---- one reference-format Mip checkpoint ------------------------------
    from switch_nerf.models.model_utils import convert_to_seqexperts
    from switch_nerf.models.nerf_moe import get_nerf_moe_inner
    args_mip = _ref_args()
    args_mip.nerfmoe_class_name = "MipNeRFMoE"
    torch.manual_seed(177)
    train_model = get_nerf_moe_inner(args_mip, appearance_count=2,
                                     xyz_dim=3).eval()
    sd = {"module." + k: v for k, v in train_model.state_dict().items()}
    ckpt_pt = tmp_path / "ref.pt"
    torch.save({"model_state_dict": sd, "iteration": 7}, ckpt_pt)

    sd_seq = convert_to_seqexperts({k: v.clone() for k, v in sd.items()})
    sd_seq = {(k[len("module."):] if k.startswith("module.") else k): v
              for k, v in sd_seq.items()}
    args_seq = _ref_args()
    args_seq.nerfmoe_class_name = "MipNeRFMoE"
    args_seq.moe_expert_type = "seqexperts"
    torch.manual_seed(178)
    ref_model = get_nerf_moe_inner(args_seq, appearance_count=2,
                                   xyz_dim=3).eval()
    ref_model.load_state_dict(sd_seq)

    # ---- OUR side: convert ckpt, run eval_image_blocknerf -----------------
    monkeypatch.setenv("SWITCH_NERF_LPIPS_SUBSTITUTE", "0")  # match fields
    common = ["--use_moe", "--use_moe_external_gate", "--use_gate_input_norm",
              "--batch_prioritized_routing", "--moe_expert_num", str(E),
              "--no_bg_nerf", "--pos_xyz_dim", "2", "--pos_dir_dim", "1",
              "--appearance_dim", "4", "--no_amp", "--use_mip",
              "--nerfmoe_class_name", "MipNeRFMoE",
              "--data_type", "block_nerf",
              "--block_train_list_path", str(root / "train.txt"),
              "--block_val_list_path", str(root / "val.txt"),
              "--block_image_hash_id_map_path", str(root / "idmap.json"),
              "--near", "0.01", "--far", "10.0",
              "--coarse_samples", "8", "--fine_samples", "8",
              "--model_chunk_size", "2048",
              "--image_pixel_batch_size", "128",
              "--model", json.dumps(GRAPH)]
    argv = (["convert", "--exp_name", str(tmp_path / "conv_exp"),
             "--dataset_path", str(root)] + common
            + ["--torch_ckpt", str(ckpt_pt),
               "--out_ckpt", str(tmp_path / "converted")])
    monkeypatch.setattr(sys, "argv", argv)
    from scripts.convert_torch_ckpt import main as conv_main
    conv_main()

    from switch_nerf_tpu.config import get_opts, parse_args
    from switch_nerf_tpu.runner import Runner
    h = parse_args(get_opts(), [
        "--exp_name", str(tmp_path / "ours_exp"),
        "--dataset_path", str(root)] + common)
    # reference pure-torch strategy == our nodrop dispatch
    h.apply_on_expert_fn_name = "apply_on_expert_fn_nobatch_torch"
    h.ckpt_path = str(tmp_path / "converted" / "7")
    ours_runner = Runner(h)
    assert ours_runner.appearance_count == 2
    our_means = ours_runner.eval_image_blocknerf()
    our_base = Path(h.exp_name)
    our_txt_lines = [
        line.split(": ") for line in
        (our_base / "images" / "metrics_300.txt").read_text().splitlines()
        if line]

    # ---- REFERENCE side: _run_validation_image_blocknerf ------------------
    import switch_nerf.runner as RR

    monkeypatch.setattr(RR.torch.cuda, "reset_peak_memory_stats",
                        lambda *a, **k: None)
    monkeypatch.setattr(RR.torch.cuda, "max_memory_allocated",
                        lambda *a, **k: 0)
    monkeypatch.setattr(RR, "lpips", lambda *a, **k: {})
    # world_size-1 "distributed" launch: RANK branch, no-op collectives
    monkeypatch.setenv("RANK", "0")
    monkeypatch.setenv("WORLD_SIZE", "1")
    monkeypatch.setattr(torch.distributed, "barrier",
                        lambda *a, **k: None, raising=False)
    monkeypatch.setattr(torch.distributed, "broadcast_object_list",
                        lambda *a, **k: None, raising=False)

    from switch_nerf.modules.tutel_moe_ext.tutel_moe_layer_nobatch import \
        MOELayer as RefMOELayer
    for mod in ref_model.modules():
        if isinstance(mod, RefMOELayer):
            orig = mod.forward

            def patched(inp, _orig=orig, **kw):
                kw["apply_on_expert_fn_name"] = \
                    "apply_on_expert_fn_nobatch_torch"
                return _orig(inp, **kw)
            mod.forward = patched

    class DDPish(torch.nn.Module):
        """render_image_blocknerf unwraps .module under RANK (ref :2900)."""

        def __init__(self, m):
            super().__init__()
            self.module = m

    class FakeWriter:
        def add_scalar(self, *a, **k):
            pass

        def add_image(self, *a, **k):
            pass

        def flush(self):
            pass

        def close(self):
            pass

    ref_exp = tmp_path / "ref_exp"
    ref_exp.mkdir()
    hp_ref = types.SimpleNamespace(
        # render_rays_mip surface (test_mip_render_gradient_parity) + the
        # blocknerf eval surface
        perturb=0.0, coarse_samples=8, fine_samples=8,
        model_chunk_size=2048, use_cascade=False, sh_deg=None,
        pos_dir_dim=1, white_bkgd=False, use_random_background_color=False,
        use_sigma_noise=False, sigma_noise_std=0.0, use_moe=True,
        bg_use_moe=False, moe_return_gates=False, return_pts=False,
        return_pts_rgb=False, return_pts_alpha=False, return_sigma=False,
        return_alpha=False, use_load_importance_loss=False,
        compute_balance_loss=False, container_path=None,
        train_mega_nerf=None, render_image_fn_name=None, bg_nerf=False,
        center_pixels=True, appearance_dim=4, amp=False,
        amp_use_bfloat16=False, image_pixel_batch_size=128,
        use_mip=True, rgb_padding=0.001, weights_resample_padding=0.01,
        stop_level_grad=True, use_balance_loss=True, moe_l_aux_wt=5e-4,
        dataset_path=str(root), exp_name=str(ref_exp),
        block_val_list_path=str(root / "val.txt"),
        block_image_hash_id_map_path=str(root / "idmap.json"))

    r = RR.Runner.__new__(RR.Runner)
    r.hparams = hp_ref
    r.device = torch.device("cpu")
    r.near, r.far = 0.01, 10.0
    r.ray_altitude_range = None
    r.sphere_center = None
    r.sphere_radius = None
    r.nerf = DDPish(ref_model)
    r.bg_nerf = None
    r.writer = FakeWriter()
    r.is_master = True
    r.experiment_path = ref_exp

    ref_metrics = RR.Runner._run_validation_image_blocknerf(r, 0)

    ref_txt_lines = [
        line.split(": ") for line in
        (ref_exp / "images" / "metrics_300.txt").read_text().splitlines()
        if line]

    # ---- the pin ----------------------------------------------------------
    # identical metrics field LIST (order included; reference :1764-1772)
    assert [k for k, _ in ref_txt_lines] == [k for k, _ in our_txt_lines] \
        == ["psnr", "ssim", "psnr_mask", "ssim_mask", "time", "memory"]
    ref_txt = dict(ref_txt_lines)
    our_txt = dict(our_txt_lines)
    for k, tol in (("psnr", 0.05), ("psnr_mask", 0.05),
                   ("ssim", 2e-3), ("ssim_mask", 2e-3)):
        assert float(our_txt[k]) == pytest.approx(
            float(ref_txt[k]), abs=tol), k
    assert our_means["psnr"] == pytest.approx(
        float(ref_metrics["val/psnr"]), abs=0.05)

    # identical hash-keyed files: images/ crops + val_images/ triptych
    ref_files = sorted(p.name for p in (ref_exp / "images").iterdir())
    our_files = sorted(p.name for p in (our_base / "images").iterdir())
    assert ref_files == our_files == [
        "300_depth.jpg", "300_gt.jpg", "300_pred.jpg", "metrics_300.txt"]
    assert (ref_exp / "val_images" / "300.jpg").exists()
    assert (our_base / "val_images" / "300.jpg").exists()

    # summary averages (sums / val_image_num) agree
    def read_summary(p):
        out = {}
        for line in p.read_text().splitlines():
            k, v = line.split(": ")
            assert k.startswith("Average ")
            out[k[len("Average "):]] = float(v)
        return out

    ref_sum = read_summary(ref_exp / "metrics.txt")
    our_sum = read_summary(ours_runner.experiment_path / "metrics.txt")
    assert set(ref_sum) == set(our_sum) == {
        "val/psnr", "val/ssim", "val/psnr_mask", "val/ssim_mask",
        "val/time", "val/memory"}
    for k, tol in (("val/psnr", 0.05), ("val/psnr_mask", 0.05),
                   ("val/ssim", 2e-3), ("val/ssim_mask", 2e-3)):
        assert our_sum[k] == pytest.approx(ref_sum[k], abs=tol), k
