"""Classic-NeRF path end-to-end: synthetic blender dataset -> train_nerf ->
eval_nerf -> eval_points_nerf."""
import json

import numpy as np
import pytest

from switch_nerf_tpu.config import get_opts_nerf, parse_args
from tests.test_trainer import tiny_moe_graph


def write_blender_scene(root, w=10, h=10, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)

    def pose(theta):
        c = np.eye(4, dtype=np.float32)
        c[2, 3] = 4.0
        rot = np.eye(4, dtype=np.float32)
        rot[0, 0] = rot[2, 2] = np.cos(theta)
        rot[0, 2] = np.sin(theta)
        rot[2, 0] = -np.sin(theta)
        return (rot @ c)

    for split, n in (("train", 4), ("val", 2), ("test", 2)):
        frames = []
        for i in range(n):
            name = f"r_{i}"
            img = rng.integers(0, 255, (h, w, 4), dtype=np.uint8)
            img[..., 3] = 255
            (root / split).mkdir(exist_ok=True)
            Image.fromarray(img).save(root / split / f"{name}.png")
            frames.append({"file_path": f"{split}/{name}",
                           "transform_matrix": pose(i * 0.5).tolist()})
        (root / f"transforms_{split}.json").write_text(json.dumps(
            {"camera_angle_x": 0.8, "frames": frames}))
    return root


@pytest.fixture(scope="module")
def blender_scene(tmp_path_factory):
    return write_blender_scene(tmp_path_factory.mktemp("blender"))


def nerf_hparams(root, tmp, **over):
    h = parse_args(get_opts_nerf(), [
        "--exp_name", str(tmp / "exp"), "--dataset_path", str(root)])
    h.data_type = "nerf"
    h.dataset_type = "blender"
    h.no_ndc = True
    h.testskip = 1
    h.bg_nerf = False
    h.appearance_dim = 0
    h.use_moe = True
    h.use_moe_external_gate = True
    h.moe_expert_num = 4
    h.moe_train_batch = True
    h.moe_test_batch = True
    h.model = tiny_moe_graph()
    h.model["layers"]["2"]["in_ch"] = 16 + 9   # no appearance column
    h.pos_xyz_dim = 2
    h.pos_dir_dim = 1
    h.coarse_samples = 4
    h.fine_samples = 4
    h.model_chunk_size = 2048
    h.batch_size = 32
    h.image_pixel_batch_size = 64
    h.num_epochs = 1
    h.train_iterations = 2
    h.ckpt_interval = 2
    h.i_print = 1
    h.amp = False
    h.render_test_points_image_num = 1
    h.render_test_points_sample_skip = 2
    for k, v in over.items():
        setattr(h, k, v)
    return h


def test_blender_train_eval_points(blender_scene, tmp_path):
    from switch_nerf_tpu.runner import Runner

    h = nerf_hparams(blender_scene, tmp_path)
    runner = Runner(h)
    assert runner.near == 2.0 and runner.far == 6.0
    # blender loader produced the right shapes
    assert runner.nerf_dataset.rays.shape[-1] == 8
    assert runner.train_set.dataset.rgbs_train.shape[1] == 3

    state = runner.train_nerf()
    ckpt = runner.model_path / "2"
    assert ckpt.exists()

    h2 = nerf_hparams(blender_scene, tmp_path / "eval")
    h2.ckpt_path = str(ckpt)
    runner2 = Runner(h2)
    means = runner2.eval_nerf()
    assert "psnr" in means and np.isfinite(means["psnr"])
    # reference file protocol (runner.py:2337-2366): the offline CLI
    # evaluates the TEST split into {mode}_images_{train_index} with
    # per-image metrics files incl. lpips/time/memory, plus the
    # persisted triptych
    out_dir = runner2.experiment_path / "test_images_0"
    # per-image files keyed by the GLOBAL img_i (i_test = [6, 7] here:
    # blender i_split concatenates train(4) + val(2) + test(2))
    for i in range(len(runner2.test_set)):
        img_i = int(runner2.test_set[i]["img_i"])
        assert img_i == 6 + i
        fields = {
            line.split(":")[0] for line in
            (out_dir / f"metrics_{img_i}.txt").read_text().splitlines()
            if line}
        assert {"psnr", "ssim", "time", "memory"} <= fields
        assert any(f.startswith("lpips-") for f in fields)
        assert (runner2.experiment_path / "val_images"
                / f"{img_i}.jpg").exists()
    assert not (runner2.experiment_path / "val_images_0").exists()
    # summary protocol file (reference runner.py:2377-2385)
    summary = (out_dir / "metrics.txt").read_text().splitlines()
    assert summary[0] == "step 0 test"
    assert any(line.startswith("Average test/psnr: ") for line in summary)
    assert any(line.startswith("Average test/lpips/") for line in summary)

    h3 = nerf_hparams(blender_scene, tmp_path / "pts")
    h3.ckpt_path = str(ckpt)
    runner3 = Runner(h3)
    written = runner3.eval_points_nerf()
    assert written
    from switch_nerf_tpu.utils.ply import read_ply_points
    xyz, rgba = read_ply_points(written[0])
    assert xyz.shape[0] == 10 * 10 * 2   # H*W rays x 4/2 samples
    total = 0
    for e in range(4):
        x_e, _ = read_ply_points(
            written[0].parent / f"000_coarse_pts_rgba_top_0_exp_{e}.ply")
        total += x_e.shape[0]
    assert total == xyz.shape[0]
