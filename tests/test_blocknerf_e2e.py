"""Block-NeRF end-to-end: tfrecord chunks -> mip MoE training -> masked eval."""
import json

import numpy as np
import pytest

from switch_nerf_tpu.config import get_opts, parse_args
from tests.test_trainer import tiny_moe_graph


def _write_record(path, image_hashes, h, w, with_mask, seed=0):
    import tensorflow as tf
    rng = np.random.default_rng(seed)
    with tf.io.TFRecordWriter(str(path), options="GZIP") as wr:
        for ih in image_hashes:
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            png = tf.io.encode_png(img).numpy()
            o = rng.normal(0, 0.1, (h, w, 3)).astype(np.float32)
            d = rng.normal(0, 1, (h, w, 3)).astype(np.float32)
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            feats = {
                "image_hash": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[ih])),
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
                    float_list=tf.train.FloatList(value=[50.0, 50.0])),
            }
            if with_mask:
                mask = np.zeros((h, w, 1), np.int64)
                mask[:2, :2] = 1  # a moving object patch
                feats["mask"] = tf.train.Feature(
                    int64_list=tf.train.Int64List(value=mask.ravel()))
            wr.write(tf.train.Example(
                features=tf.train.Features(feature=feats))
                .SerializeToString())


def test_blocknerf_train_and_masked_eval(tmp_path):
    pytest.importorskip("tensorflow")
    from switch_nerf_tpu.runner import Runner

    root = tmp_path / "data"
    root.mkdir()
    _write_record(root / "train0.tfrecord", [100, 101], 8, 12, False)
    _write_record(root / "validation0.tfrecord", [200], 8, 12, True, seed=1)
    (root / "train.txt").write_text("train0.tfrecord\n")
    (root / "val.txt").write_text("validation0.tfrecord\n")
    (root / "idmap.json").write_text(json.dumps({
        "train0.tfrecord": {"100": 0, "101": 1},
        "validation0.tfrecord": {"200": 2},
    }))

    def hp(exp):
        h = parse_args(get_opts(), [
            "--exp_name", str(tmp_path / exp), "--dataset_path", str(root)])
        h.data_type = "block_nerf"
        h.dataset_type = "filesystem"
        h.chunk_paths = [str(tmp_path / "chunks")]
        h.num_chunks = 2
        h.block_train_list_path = str(root / "train.txt")
        h.block_val_list_path = str(root / "val.txt")
        h.block_image_hash_id_map_path = str(root / "idmap.json")
        h.near, h.far = 0.01, 10.0
        h.bg_nerf = False
        h.use_mip = True
        h.use_moe = True
        h.use_moe_external_gate = True
        h.moe_expert_num = 4
        h.moe_train_batch = True
        h.moe_test_batch = True
        h.nerfmoe_class_name = "MipNeRFMoE"
        h.model = tiny_moe_graph()
        # mip input: 6 (mean+cov) but PE over 3 dims -> same graph widths;
        # dir+app widths: 9 + 4
        h.pos_xyz_dim = 2
        h.pos_dir_dim = 1
        h.appearance_dim = 4
        h.coarse_samples = 4
        h.fine_samples = 4
        h.model_chunk_size = 2048
        h.batch_size = 32
        h.image_pixel_batch_size = 48
        h.train_iterations = 2
        h.ckpt_interval = 2
        h.i_print = 1
        h.amp = False
        return h

    h1 = hp("train")
    runner = Runner(h1)
    assert runner.appearance_count == 3   # max id 2 + 1
    runner.train()
    ckpt = runner.model_path / "2"
    assert ckpt.exists()

    h2 = hp("eval")
    h2.ckpt_path = str(ckpt)
    runner2 = Runner(h2)
    means = runner2.eval_image_blocknerf()
    for k in ("psnr", "ssim", "psnr_mask", "ssim_mask"):
        assert k in means and np.isfinite(means[k]), (k, means)
    # masked metrics differ from unmasked (mask excludes a corner patch)
    assert means["psnr_mask"] != pytest.approx(means["psnr"], abs=1e-6)
