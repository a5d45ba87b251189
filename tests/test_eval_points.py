"""eval_points PLY export + merge_points + PLY IO roundtrip."""
import numpy as np
import pytest

from switch_nerf_tpu.utils.ply import read_ply_points, write_ply_points


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(0, 1, (100, 3)).astype(np.float32)
    rgba = rng.integers(0, 255, (100, 4), dtype=np.uint8)
    p = tmp_path / "pts.ply"
    write_ply_points(p, xyz, rgba)
    x2, r2 = read_ply_points(p)
    np.testing.assert_array_equal(xyz, x2)
    np.testing.assert_array_equal(rgba, r2)


def test_merge_points_nerf_discovery(tmp_path):
    """model_type='nerf' merge_all discovers image ids from the PLY
    filename prefixes (reference merge_points.py:38-43) and uses the
    same top_{k}_exp_{e} naming as 'switch' (:61-62)."""
    from scripts.merge_points import merge

    rng = np.random.default_rng(1)
    for image_id in ("000", "003"):            # non-contiguous ids
        d = tmp_path / image_id
        d.mkdir()
        for e in range(2):
            xyz = rng.normal(0, 1, (40, 3)).astype(np.float32)
            rgba = rng.integers(0, 255, (40, 4), dtype=np.uint8)
            write_ply_points(
                d / f"{int(image_id):03d}_coarse_pts_rgba_top_0_exp_{e}.ply",
                xyz, rgba)

    out = tmp_path / "merged"
    merge(tmp_path, out, down_scale=0.5, expert_num=2, merge_all=True,
          model_type="nerf")
    for e in range(2):
        x, _ = read_ply_points(out / f"coarse_pts_rgba_exp_{e}.ply")
        # int(40 * 0.5) per image x 2 images (reference sample_num law)
        assert x.shape[0] == 40


def test_merge_points_noncontiguous_dirs(tmp_path):
    """merge_all auto-discovery (image_num=0) uses the actual numeric dir
    names, so a non-zero-based / non-contiguous eval_points subset (e.g.
    dirs 5 and 7 only) merges instead of probing paths that never
    existed."""
    from scripts.merge_points import merge

    rng = np.random.default_rng(2)
    for image_id in ("5", "7"):
        d = tmp_path / image_id
        d.mkdir()
        xyz = rng.normal(0, 1, (40, 3)).astype(np.float32)
        rgba = rng.integers(0, 255, (40, 4), dtype=np.uint8)
        write_ply_points(
            d / f"{int(image_id):03d}_coarse_pts_rgba_top_0_exp_0.ply",
            xyz, rgba)

    out = tmp_path / "merged"
    merge(tmp_path, out, down_scale=1.0, expert_num=1, merge_all=True,
          model_type="switch")
    x, _ = read_ply_points(out / "coarse_pts_rgba_exp_0.ply")
    assert x.shape[0] == 80


def test_merge_points_empty_input_errors(tmp_path):
    """A data_path with no per-image content is a loud error (wrong
    --data_path), not 8 silently-empty merged clouds."""
    from scripts.merge_points import merge

    with pytest.raises(FileNotFoundError, match="no per-image point"):
        merge(tmp_path, tmp_path / "merged", expert_num=2, merge_all=True,
              model_type="switch")


def test_eval_points_and_merge(tmp_path):
    """Train a tiny MoE 2 iters on a synthetic scene, export point clouds,
    merge them."""
    import torch
    from PIL import Image

    # synthetic scene (same layout as test_runner_e2e)
    root = tmp_path / "scene"
    w, h = 16, 12
    rng = np.random.default_rng(0)
    for split, names in (("train", ["000", "001"]), ("val", ["002"])):
        (root / split / "metadata").mkdir(parents=True)
        (root / split / "rgbs").mkdir(parents=True)
        for name in names:
            c2w = np.eye(3, 4, dtype=np.float32)
            c2w[:, 3] = rng.normal(0, 0.1, 3).astype(np.float32)
            c2w[0, 3] -= 0.5
            torch.save({"c2w": torch.tensor(c2w), "W": w, "H": h,
                        "intrinsics": torch.tensor([15.0, 15.0, w / 2,
                                                    h / 2])},
                       root / split / "metadata" / f"{name}.pt")
            img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
            Image.fromarray(img).save(root / split / "rgbs" / f"{name}.jpg")
    torch.save({"origin_drb": torch.zeros(3), "pose_scale_factor": 10.0},
               root / "coordinates.pt")

    from switch_nerf_tpu.config import get_opts, parse_args
    from switch_nerf_tpu.runner import Runner
    from tests.test_trainer import tiny_moe_graph

    def hp(exp):
        hh = parse_args(get_opts(), [
            "--exp_name", str(tmp_path / exp), "--dataset_path", str(root)])
        hh.dataset_type = "memory"
        hh.near = 0.5
        hh.bg_nerf = False
        hh.use_moe = True
        hh.use_moe_external_gate = True
        hh.moe_expert_num = 4
        hh.moe_train_batch = True
        hh.moe_test_batch = True
        hh.model = tiny_moe_graph()
        hh.pos_xyz_dim = 2
        hh.pos_dir_dim = 1
        hh.appearance_dim = 4
        hh.coarse_samples = 4
        hh.fine_samples = 4
        hh.model_chunk_size = 2048
        hh.batch_size = 32
        hh.image_pixel_batch_size = 64
        hh.train_iterations = 2
        hh.ckpt_interval = 2
        hh.i_print = 1
        hh.amp = False
        hh.render_test_points_image_num = 1
        hh.render_test_points_sample_skip = 2
        hh.return_pts_class_seg = True
        return hh

    h1 = hp("train")
    runner = Runner(h1)
    runner.train()
    ckpt = runner.model_path / "2"
    assert ckpt.exists()

    h2 = hp("points")
    h2.ckpt_path = str(ckpt)
    h2.render_test_points_typ = ["coarse", "fine"]   # reference :2011 loop
    runner2 = Runner(h2)
    written = runner2.eval_points()
    assert written, "no PLY files written"
    names = {p.name for p in written}
    assert "000_coarse_pts_rgba.ply" in names
    assert "000_coarse_pts_rgba_top_0_exp_0.ply" in names
    # fine typ exported too (--render_test_points_typ fine, ref :2011)
    assert "000_fine_pts_rgba.ply" in names
    assert "000_fine_pts_rgba_top_0_exp_3.ply" in names

    all_ply = next(p for p in written
                   if p.name == "000_coarse_pts_rgba.ply")
    xyz, rgba = read_ply_points(all_ply)
    # val image is downscaled by val_scale_factor (default 4):
    # (H/4)*(W/4) rays x ceil(4/2) samples
    vi = runner2.val_items[0]
    assert xyz.shape[0] == vi.H * vi.W * 2
    xyz_f, _ = read_ply_points(all_ply.parent / "000_fine_pts_rgba.ply")
    assert xyz_f.shape[0] == vi.H * vi.W * 2        # fine_samples=4, skip 2
    # expert clouds partition the all-points cloud
    total = 0
    for e in range(4):
        x_e, _ = read_ply_points(
            all_ply.parent / f"000_coarse_pts_rgba_top_0_exp_{e}.ply")
        total += x_e.shape[0]
    assert total == xyz.shape[0]
    # seg clouds (return_pts_class_seg; reference :2169-2255 name set):
    # the _alpha variant is RGBA; the plain variant is RGB-only with the
    # last sample painted in the ray's composited render color
    seg_a_xyz, seg_a_col = read_ply_points(
        all_ply.parent / "000_coarse_top_0_alpha.ply")
    assert seg_a_col.shape[1] == 4 and seg_a_xyz.shape[0] == xyz.shape[0]
    seg_xyz, seg_col = read_ply_points(
        all_ply.parent / "000_coarse_top_0.ply")
    assert seg_col.shape[1] == 3 and seg_xyz.shape[0] == xyz.shape[0]
    assert (all_ply.parent / "000_coarse_top_0_alpha_exp_1.ply").exists()
    assert (all_ply.parent / "000_coarse_top_0_exp_1.ply").exists()
    # seg colors come from palette rows 1.. (row 0 = background skipped,
    # reference :2170) — with alpha-variant rows matching the expert split
    from switch_nerf_tpu.utils.visualize import voc_palette
    pal = voc_palette()[1:5]
    assert all(tuple(c[:3]) in {tuple(p) for p in pal}
               for c in seg_a_col[:64])

    # merge script (reference CLI semantics: expert_num > 0 merges one
    # PLY per expert named {typ}_pts_rgba_exp_{e}.ply; expert_num == 0
    # merges the all-points cloud)
    from scripts.merge_points import merge
    merged_dir = tmp_path / "merged"
    merge(all_ply.parent.parent, merged_dir, down_scale=0.5,
          expert_num=4)
    merged = sorted(merged_dir.glob("coarse_pts_rgba_exp_*.ply"))
    assert len(merged) == 4
    merge(all_ply.parent.parent, merged_dir, down_scale=0.5,
          expert_num=0)
    xm, _ = read_ply_points(merged_dir / "coarse_pts_rgba.ply")
    assert 0 < xm.shape[0] <= xyz.shape[0]
