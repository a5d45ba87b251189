"""Native C++ kernels vs numpy reference (exact parity required)."""
import numpy as np
import pytest

from switch_nerf_tpu.native import (compute_rays_native, gather_rows,
                                    get_lib, reconstruct_rays_native)
from switch_nerf_tpu.datasets.ray_utils import (compute_image_rays,
                                                get_ray_directions, get_rays)

native = pytest.mark.skipif(get_lib() is None,
                            reason="native toolchain unavailable")


def _scene(seed=0):
    rng = np.random.default_rng(seed)
    c2w = np.eye(3, 4, dtype=np.float32)
    # random-ish rotation via QR
    q, _ = np.linalg.qr(rng.normal(0, 1, (3, 3)))
    c2w[:, :3] = q.astype(np.float32)
    c2w[:, 3] = rng.normal(0, 1, 3).astype(np.float32)
    intr = np.array([37.0, 41.0, 8.0, 6.0], np.float32)
    return c2w, intr


@native
@pytest.mark.parametrize("alt", [None, [-3.0, 0.5]])
@pytest.mark.parametrize("center", [True, False])
def test_compute_rays_matches_numpy(alt, center):
    c2w, intr = _scene()
    w, h = 16, 12
    got = compute_rays_native(c2w, w, h, intr, center, 0.1, 5.0, alt)
    directions = get_ray_directions(w, h, intr[0], intr[1], intr[2],
                                    intr[3], center)
    want = get_rays(directions, c2w, 0.1, 5.0, alt).reshape(-1, 8)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_compute_image_rays_wrapper():
    c2w, intr = _scene(1)
    rays = compute_image_rays(c2w, 8, 6, intr, True, 0.1, 5.0, None)
    assert rays.shape == (48, 8)
    d = rays[:, 3:6]
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-5)


@native
def test_gather_rows():
    rng = np.random.default_rng(0)
    src = rng.normal(0, 1, (100, 7)).astype(np.float32)
    perm = rng.permutation(100)
    np.testing.assert_array_equal(gather_rows(src, perm), src[perm])
    src_u8 = rng.integers(0, 255, (50, 3), dtype=np.uint8)
    perm2 = rng.integers(0, 50, size=(80,))
    np.testing.assert_array_equal(gather_rows(src_u8, perm2), src_u8[perm2])


@native
def test_reconstruct_rays_matches_numpy():
    rng = np.random.default_rng(2)
    w, h = 10, 8
    intr = np.array([25.0, 25.0, 5.0, 4.0], np.float32)
    directions = get_ray_directions(w, h, *intr, True).reshape(-1, 3)
    c2ws = []
    for i in range(3):
        c2w, _ = _scene(seed=10 + i)
        c2ws.append(c2w)
    c2ws = np.stack(c2ws)
    n = 200
    pix = rng.integers(0, w * h, size=(n,)).astype(np.int64)
    img = rng.integers(0, 3, size=(n,)).astype(np.int16)
    alt = np.array([-2.0, 1.0], np.float32)

    got = reconstruct_rays_native(directions, c2ws, pix, img, 0.1, 5.0, alt)

    dirs = directions[pix]
    c2w = c2ws[img.astype(np.int64)]
    rays_d = np.einsum("nij,nj->ni", c2w[:, :, :3], dirs)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = c2w[:, :, 3].copy()
    from switch_nerf_tpu.datasets.ray_utils import _get_rays_inner
    want = _get_rays_inner(rays_o, rays_d, 0.1, 5.0, [-2.0, 1.0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
