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
