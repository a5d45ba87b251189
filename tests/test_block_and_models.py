"""Block-NeRF tfrecord pipeline + Cascade/MegaNeRF model tests."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from switch_nerf_tpu.config import get_opts_base, parse_args


@pytest.fixture(scope="module")
def block_record(tmp_path_factory):
    tf = pytest.importorskip("tensorflow")
    tmp = tmp_path_factory.mktemp("block")
    rec_name = "seg0.tfrecord"
    h, w = 6, 8
    rng = np.random.default_rng(0)
    path = str(tmp / rec_name)
    with tf.io.TFRecordWriter(path, options="GZIP") as wr:
        for i in range(2):
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            png = tf.io.encode_png(img).numpy()
            o = rng.normal(0, 1, (h, w, 3)).astype(np.float32)
            d = rng.normal(0, 1, (h, w, 3)).astype(np.float32)
            feats = {
                "image_hash": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[100 + i])),
                "cam_idx": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[1])),
                "equivalent_exposure": tf.train.Feature(
                    float_list=tf.train.FloatList(value=[0.5])),
                "height": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[h])),
                "width": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[w])),
                "image": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[png])),
                "ray_origins": tf.train.Feature(
                    float_list=tf.train.FloatList(value=o.ravel())),
                "ray_dirs": tf.train.Feature(
                    float_list=tf.train.FloatList(value=d.ravel())),
                "intrinsics": tf.train.Feature(
                    float_list=tf.train.FloatList(value=[100.0, 100.0])),
            }
            wr.write(tf.train.Example(
                features=tf.train.Features(feature=feats))
                .SerializeToString())
    (tmp / "train.txt").write_text(rec_name + "\n")
    (tmp / "idmap.json").write_text(
        json.dumps({rec_name: {"100": 0, "101": 1}}))
    return tmp, rec_name


def test_block_filesystem_dataset(block_record, tmp_path):
    tmp, rec_name = block_record
    from switch_nerf_tpu.datasets.block_filesystem_dataset import (
        BlockFilesystemDataset, load_tfrecord)

    ds = BlockFilesystemDataset(
        str(tmp), near=0.01, far=10.0, scale_factor=1,
        list_path=str(tmp / "train.txt"),
        id_map_path=str(tmp / "idmap.json"),
        chunk_paths=[tmp_path / "chunks"], num_chunks=2,
        disk_flush_size=1000)
    ds.load_chunk()
    assert len(ds) > 0
    item = ds[0]
    assert item["rays"].shape == (8,)
    assert item["radii"].shape == (1,)
    np.testing.assert_allclose(item["rays"][6:8], [0.01, 10.0])

    batch = next(ds.sample_batches(8))
    assert batch["rays"].shape == (8, 8)
    assert batch["radii"].shape == (8, 1)

    # resume state round-trip
    s = ds.get_state()
    ds.load_chunk()
    ds.set_state(s)
    ds.load_chunk()

    # eval-side loader: full-image rays/radii
    dicts = load_tfrecord(str(tmp / rec_name), {"100": 0, "101": 1},
                          0.01, 10.0)
    assert len(dicts) == 2
    assert dicts[0]["rays"].shape == (6, 8, 8)
    assert dicts[0]["radii"].shape == (6, 8, 1)
    assert dicts[0]["rgbs"].shape == (6, 8, 3)


def test_cascade_train_step():
    from switch_nerf_tpu.models.model_utils import get_nerf
    from switch_nerf_tpu.trainer import (SceneInfo, create_train_state,
                                         make_train_step,
                                         render_config_from_hparams)

    h = parse_args(get_opts_base(), [])
    h.use_cascade = True
    h.pos_xyz_dim = 2
    h.pos_dir_dim = 1
    h.appearance_dim = 4
    h.layers = 2
    h.skip_layers = [1]
    h.layer_dim = 16
    h.coarse_samples = 4
    h.fine_samples = 4
    h.model_chunk_size = 4096
    h.batch_size = 32
    h.amp = False
    model = get_nerf(h, 4)
    state = create_train_state(jax.random.PRNGKey(0), h, model, None)
    assert "coarse" in state.params["nerf"]
    assert "fine" in state.params["nerf"]

    step = jax.jit(make_train_step(model, None, h,
                                   render_config_from_hparams(h),
                                   SceneInfo()))
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    o = jax.random.normal(ks[0], (32, 3)) * 0.1
    d = jax.random.normal(ks[1], (32, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    batch = {"rays": jnp.concatenate(
        [o, d, jnp.full((32, 1), 0.5), jnp.full((32, 1), 2.5)], -1),
        "rgbs": jax.random.uniform(ks[2], (32, 3)),
        "image_indices": jnp.zeros((32,))}
    new_state, m = step(state, batch)
    assert "coarse_loss" in m
    assert np.isfinite(float(m["loss"]))
    # both levels trained
    f0 = jax.tree_util.tree_leaves(state.params["nerf"]["fine"])[0]
    f1 = jax.tree_util.tree_leaves(new_state.params["nerf"]["fine"])[0]
    assert not np.array_equal(np.asarray(f0), np.asarray(f1))


def test_mega_nerf_blend_and_hard():
    from switch_nerf_tpu.models.mega_nerf import MegaNeRF
    from switch_nerf_tpu.models.nerf import NeRF

    subs = [NeRF(pos_xyz_dim=2, pos_dir_dim=0, layers=1, skip_layers=(),
                 layer_dim=8, appearance_dim=0, appearance_count=0)
            for _ in range(3)]
    cents = ((0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    x = jax.random.normal(jax.random.PRNGKey(2), (16, 3))

    mn = MegaNeRF(sub_modules=subs, centroids=cents, boundary_margin=1.15)
    out = mn.apply(mn.init(jax.random.PRNGKey(3), x), x)
    assert out.shape == (16, 4) and bool(jnp.isfinite(out).all())

    mn1 = MegaNeRF(sub_modules=subs, centroids=cents, boundary_margin=1.0)
    out1 = mn1.apply(mn1.init(jax.random.PRNGKey(3), x), x)
    assert out1.shape == (16, 4) and bool(jnp.isfinite(out1).all())


def test_interval_lookup_vs_searchsorted():
    from switch_nerf_tpu.ops.volume import interval_lookup
    rng = np.random.default_rng(0)
    n, b, f = 17, 11, 13
    bins = np.sort(rng.uniform(0, 5, (n, b + 1)), -1).astype(np.float32)
    w = rng.uniform(0, 1, (n, b)).astype(np.float32)
    w[:, ::3] = 0.0  # duplicate-heavy cdf
    pdf = w + 1e-8
    pdf /= pdf.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((n, 1), np.float32),
                          np.cumsum(pdf, -1).astype(np.float32)], -1)
    u = rng.uniform(0, 1, (n, f)).astype(np.float32)

    inds = np.stack([np.searchsorted(cdf[i], u[i], side="right")
                     for i in range(n)])
    below = np.clip(inds - 1, 0, None)
    above = np.clip(inds, None, b)
    want = (np.take_along_axis(cdf, below, -1),
            np.take_along_axis(cdf, above, -1),
            np.take_along_axis(bins, below, -1),
            np.take_along_axis(bins, above, -1))
    got = interval_lookup(jnp.asarray(cdf), jnp.asarray(bins),
                          jnp.asarray(u))
    for a, g in zip(want, got):
        np.testing.assert_allclose(a, np.asarray(g), atol=1e-6)


def test_sort_with_payloads_grad():
    from switch_nerf_tpu.ops.sorting import sort_with_payloads
    key = jax.random.PRNGKey(0)
    z = jax.random.uniform(key, (4, 9))
    p = jax.random.normal(jax.random.PRNGKey(1), (4, 9))

    def f(p):
        zs, ps = sort_with_payloads(z, p)
        return jnp.sum(zs * ps)

    def f_ref(p):
        order = jnp.argsort(z, axis=-1)
        return jnp.sum(jnp.take_along_axis(z, order, -1)
                       * jnp.take_along_axis(p, order, -1))

    np.testing.assert_allclose(np.asarray(f(p)), np.asarray(f_ref(p)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jax.grad(f)(p)),
                               np.asarray(jax.grad(f_ref)(p)), rtol=1e-5)


def test_llff_loader(tmp_path):
    """Synthetic LLFF scene: poses_bounds.npy + images dir -> NDC rays."""
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
        rot = np.array([[np.cos(th), 0, np.sin(th)],
                        [0, 1, 0],
                        [-np.sin(th), 0, np.cos(th)]], np.float32)
        poses[i, :, :3] = rot
        poses[i, :, 3] = [0.1 * i, 0, 0]
        poses[i, :, 4] = [h, w, 20.0]
    bds = np.stack([np.full(n, 1.0), np.full(n, 10.0)], -1).astype(np.float32)
    arr = np.concatenate([poses.reshape(n, 15), bds], -1)
    np.save(tmp_path / "poses_bounds.npy", arr)

    import argparse
    args = argparse.Namespace(
        dataset_type="llff", datadir=str(tmp_path), factor=1,
        spherify=False, llffhold=3, no_ndc=False, half_res=False,
        testskip=1, white_bkgd=False, scale_factor=1,
        bungee_ray_nearfar="sphere", shape="cube")
    from switch_nerf_tpu.datasets.nerf_data import NeRFDataset
    ds = NeRFDataset(args)
    assert ds.rays.shape == (n, h, w, 8)
    assert np.isfinite(ds.rays).all()
    assert ds.near == 0.0 and ds.far == 1.0      # NDC bounds
    assert len(ds.i_test) == 2                    # llffhold=3 over 6 images
    assert ds.rays_train.shape[0] == (n - 2) * h * w


def test_converter_rejects_unknown_expert_layouts():
    """convert_nerf_moe_state_dict only understands the training-format
    'expertmlp' stacks; seqexperts/ffn layouts (reference
    tutel_moe_layer_nobatch.py:641-652) must fail loudly, not mis-map."""
    import numpy as np
    import pytest
    from scripts.convert_torch_ckpt import convert_nerf_moe_state_dict

    with pytest.raises(ValueError, match="residual_expert"):
        convert_nerf_moe_state_dict(
            {"layers.0.residual_expert.experts.0.fcs.0.weight":
             np.zeros((4, 4), np.float32)})
    with pytest.raises(ValueError, match="expertmlp"):
        convert_nerf_moe_state_dict(
            {"layers.0.experts.0.experts.1.layers.0.weight":
             np.zeros((4, 4), np.float32)})
    # the supported layouts still convert
    out = convert_nerf_moe_state_dict({
        "layers.0.experts.0.weights.0": np.zeros((2, 4, 4), np.float32),
        "layers.0.residual_expert.weights.0":
            np.zeros((1, 4, 4), np.float32),
        "layers.0.coefficient.weight": np.zeros((2, 4), np.float32)})
    assert set(out) == {"layer_0/experts/w0", "layer_0/residual_expert/w0",
                        "layer_0/coefficient/kernel"}


def test_gigapixel_loader(tmp_path):
    """Gigapixel 2-D image loader (reference load_gigapixel.py — dead code
    upstream, kept for surface parity): floor-sized bilinear downscale,
    [0,1] float pixels, centered [-1,1] pixel-coordinate grid."""
    from PIL import Image as PILImage
    from switch_nerf_tpu.datasets.nerf_data.load_gigapixel import (
        load_gigapixel_data)

    rng = np.random.default_rng(3)
    h, w = 11, 17
    path = tmp_path / "big.png"
    PILImage.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                       ).save(path)

    img, coords = load_gigapixel_data(path)
    assert img.shape == (h, w, 3) and img.dtype == np.float32
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert coords.shape == (h, w, 2)
    # center-pixel convention: first/last coords symmetric about 0
    np.testing.assert_allclose(coords[0, 0], [-1 + 1 / w, -1 + 1 / h],
                               rtol=1e-6)
    np.testing.assert_allclose(coords[-1, -1], [1 - 1 / w, 1 - 1 / h],
                               rtol=1e-6)

    # reference convention: scale<1 -> floor(scale*dim), bilinear
    img2, coords2 = load_gigapixel_data(path, scale_factor=0.5)
    assert img2.shape == (h // 2, w // 2, 3)   # floor(0.5*11)=5, floor(0.5*17)=8
    assert coords2.shape == (h // 2, w // 2, 2)

    # integer >1 divides
    img3, _ = load_gigapixel_data(path, scale_factor=2)
    assert img3.shape == (h // 2, w // 2, 3)


def test_copy_images_undistorts_into_dataset(tmp_path):
    """copy_images parity (reference scripts/copy_images.py): mappings.txt
    is `<image>,<metadata_name>`, the metadata is found in train/ OR val/,
    the image is undistorted with the metadata camera matrix + distortion
    and written to <split>/rgbs/<metadata_stem>.<ext>."""
    import cv2
    import torch
    from scripts.copy_images import undistort_into_dataset

    rng = np.random.default_rng(7)
    h, w = 24, 32
    raw = tmp_path / "raw"
    raw.mkdir()
    imgs = {}
    for name in ("a.png", "b.png"):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(raw / name), img)
        imgs[name] = img

    ds = tmp_path / "ds"
    (ds / "train" / "metadata").mkdir(parents=True)
    (ds / "val" / "metadata").mkdir(parents=True)
    meta = {"intrinsics": torch.tensor([50.0, 50.0, w / 2, h / 2]),
            "distortion": torch.zeros(4), "H": h, "W": w}
    torch.save(meta, ds / "train" / "metadata" / "000000.pt")
    torch.save(meta, ds / "val" / "metadata" / "000001.pt")
    (ds / "mappings.txt").write_text("a.png,000000.pt\nb.png,000001.pt\n")

    n = undistort_into_dataset(raw, ds)
    assert n == 2
    out_train = cv2.imread(str(ds / "train" / "rgbs" / "000000.png"))
    out_val = cv2.imread(str(ds / "val" / "rgbs" / "000001.png"))
    # zero distortion -> undistortion is the identity remap
    assert np.abs(out_train.astype(int) - imgs["a.png"].astype(int)).max() <= 1
    assert np.abs(out_val.astype(int) - imgs["b.png"].astype(int)).max() <= 1

    # nonzero distortion actually changes pixels (the step isn't a no-op)
    meta2 = dict(meta, distortion=torch.tensor([0.3, 0.01, 0.0, 0.0]))
    torch.save(meta2, ds / "train" / "metadata" / "000000.pt")
    undistort_into_dataset(raw, ds)
    out2 = cv2.imread(str(ds / "train" / "rgbs" / "000000.png"))
    assert np.abs(out2.astype(int) - imgs["a.png"].astype(int)).max() > 1
