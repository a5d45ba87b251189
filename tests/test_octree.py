"""Octree build/query/save/load + grid weight marching tests."""
import numpy as np

from switch_nerf_tpu.octree import (Octree, build_octree, grid_points,
                                    grid_weights,
                                    sigma_threshold_from_alpha)


def test_build_and_query_roundtrip(tmp_path):
    reso = 8
    occupied = np.zeros((reso, reso, reso), bool)
    occupied[1, 2, 3] = True
    occupied[6, 6, 6] = True
    occupied[0, 0, 0] = True

    def payload(cells):
        # payload encodes the cell coords for verification
        return np.concatenate([cells.astype(np.float32),
                               np.ones((cells.shape[0], 1))], -1)

    center, radius = [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]
    tree = build_octree(occupied, payload, center, radius, "RGBA")
    assert tree.data.shape == (3, 4)
    assert tree.depth == 3

    # query at occupied cell centers returns that cell's payload
    pts = grid_points(center, radius, reso).reshape(reso, reso, reso, 3)
    for cell in [(1, 2, 3), (6, 6, 6), (0, 0, 0)]:
        q = tree.query(pts[cell][None])
        np.testing.assert_allclose(q[0, :3], cell)
    # empty space -> zeros
    q = tree.query(pts[(4, 1, 1)][None])
    np.testing.assert_allclose(q[0], 0.0)
    # outside the bbox -> zeros
    q = tree.query(np.array([[5.0, 5.0, 5.0]], np.float32))
    np.testing.assert_allclose(q[0], 0.0)

    tree.save(tmp_path / "tree.npz")
    t2 = Octree.load(tmp_path / "tree.npz")
    np.testing.assert_array_equal(tree.child, t2.child)
    np.testing.assert_array_equal(tree.data, t2.data)
    assert t2.data_format == "RGBA"


def test_sigma_threshold():
    t = sigma_threshold_from_alpha(0.01, 256)
    assert t > 0
    # alpha of that sigma over delta=2/reso is the requested threshold
    delta = 2.0 / 256
    np.testing.assert_allclose(1 - np.exp(-t * delta), 0.01, rtol=1e-6)


def test_grid_weights_sees_occupied_cell():
    reso = 16
    sigma = np.zeros((reso, reso, reso), np.float32)
    sigma[8, 8, 8] = 50.0                # a dense blob at the center
    # camera at +z looking toward -z (standard NeRF convention)
    pose = np.eye(3, 4, dtype=np.float32)
    pose[:, 3] = [0.0, 0.0, 2.0]
    cam = (16, 16, 8.0, 8.0, 8.0, 8.0)
    w = grid_weights(sigma, pose[None], [0, 0, 0], [1, 1, 1], cam,
                     ray_subsample=1)
    assert w[8, 8, 8] > 0.1              # the blob receives weight
    assert w[0, 0, 0] < w[8, 8, 8]


def test_octree_extraction_e2e(tmp_path):
    """Drive scripts/create_octree_moe.py against a trained-from-init SH
    model on a synthetic scene (sigma masking mode)."""
    import json
    import sys as _sys
    import torch
    from PIL import Image

    rng = np.random.default_rng(0)
    root = tmp_path / "scene"
    for split, names in (("train", ["000", "001"]), ("val", ["002"])):
        (root / split / "metadata").mkdir(parents=True)
        (root / split / "rgbs").mkdir(parents=True)
        for name in names:
            c2w = np.eye(3, 4, dtype=np.float32)
            c2w[2, 3] = 2.0
            torch.save({"c2w": torch.tensor(c2w), "W": 8, "H": 8,
                        "intrinsics": torch.tensor([10.0, 10.0, 4.0, 4.0])},
                       root / split / "metadata" / f"{name}.pt")
            Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
                            ).save(root / split / "rgbs" / f"{name}.jpg")
    torch.save({"origin_drb": torch.zeros(3), "pose_scale_factor": 1.0},
               root / "coordinates.pt")

    # train 1 step to produce a checkpoint (dense SH model: pos_dir_dim=0,
    # sh_deg=1 -> rgb_dim = 12)
    from switch_nerf_tpu.config import get_opts, parse_args
    from switch_nerf_tpu.runner import Runner
    h = parse_args(get_opts(), [
        "--exp_name", str(tmp_path / "exp"), "--dataset_path", str(root)])
    h.dataset_type = "memory"
    h.bg_nerf = False
    h.appearance_dim = 0
    h.pos_dir_dim = 0
    h.sh_deg = 1
    h.pos_xyz_dim = 2
    h.layers = 2
    h.skip_layers = [1]
    h.layer_dim = 16
    h.coarse_samples = 4
    h.fine_samples = 4
    h.model_chunk_size = 2048
    h.batch_size = 32
    h.train_iterations = 1
    h.ckpt_interval = 1
    h.i_print = 1
    h.amp = False
    runner = Runner(h)
    runner.train()
    ckpt = runner.model_path / "1"
    assert ckpt.exists()

    from scripts.create_octree_moe import main as octree_main
    out = tmp_path / "tree.npz"
    argv = ["create_octree", "--dataset_path", str(root),
            "--output", str(out), "--ckpt_path", str(ckpt),
            "--no_bg_nerf", "--appearance_dim", "0", "--pos_dir_dim", "0",
            "--sh_deg", "1", "--pos_xyz_dim", "2", "--layers", "2",
            "--skip_layers", "1", "--layer_dim", "16", "--no_amp",
            "--init_grid_depth", "4", "--alpha_thresh", "0.0005",
            "--scale_alpha_thresh", "0.0005", "--samples_per_cell", "2",
            "--masking_mode", "sigma", "--model_chunk_size", "2048"]
    old = _sys.argv
    _sys.argv = argv
    try:
        octree_main()
    finally:
        _sys.argv = old

    tree = Octree.load(out)
    assert tree.depth == 4
    assert tree.data_format == "SH4"
    assert tree.data.shape[0] > 0
    assert tree.data.shape[1] == 3 * 4 + 1   # SH coeffs + sigma
    # query returns finite payloads inside the bbox
    q = tree.query(np.asarray(tree.center, np.float32)[None])
    assert np.isfinite(q).all()


def test_grid_weights_distant_camera():
    """A camera standing farther than one grid diagonal from the box must
    still deposit weight (the march starts at the ray-box entry distance,
    not at t=0 — review fix)."""
    import numpy as np
    from switch_nerf_tpu.octree import grid_weights
    reso = 16
    sigma = np.zeros((reso, reso, reso), np.float32)
    sigma[8, 8, 8] = 50.0
    pose = np.eye(3, 4, dtype=np.float32)
    pose[:, 3] = [0.0, 0.0, 20.0]           # 20 units away; diag ~3.46
    cam = (16, 16, 80.0, 80.0, 8.0, 8.0)    # narrow FoV at the box
    w = grid_weights(sigma, pose[None], [0, 0, 0], [1, 1, 1], cam,
                     ray_subsample=1)
    assert w[8, 8, 8] > 0.1
