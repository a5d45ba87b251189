"""Block-NeRF end-to-end: tfrecord chunks -> mip MoE training -> masked eval.

The eval protocol (right-half crops, masked metrics, metrics_{hash}.txt
field set, val_image_num aggregation) is pinned against the REFERENCE's own
torch metric formulas in test_blocknerf_eval_protocol_reference_formulas —
expectations are computed independently from the reference functions, not
from our implementation's output.
"""
import json
from pathlib import Path

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
                # moving-object patch in the RIGHT half: eval metrics are
                # computed on the right-half crop (reference
                # runner.py:1700-1703), so only a right-half patch makes
                # masked and unmasked metrics meaningfully differ
                mask[:2, w - 2:] = 1
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
    for k in ("psnr", "ssim", "psnr_mask", "ssim_mask", "time", "memory"):
        assert k in means and np.isfinite(means[k]), (k, means)
    assert any(k.startswith("lpips-") for k in means), means
    # masked metrics differ from unmasked (moving-object patch sits inside
    # the evaluated right-half crop)
    assert means["psnr_mask"] != pytest.approx(means["psnr"], abs=1e-6)

    # reference file layout (runner.py:1659-1830): everything keyed by
    # image HASH under exp_name/{images,val_images,val_metrics}
    base = Path(h2.exp_name)
    assert (base / "val_images" / "200.jpg").exists()
    assert (base / "val_metrics" / "metrics-200.json").exists()
    for suf in ("gt", "pred", "depth"):
        assert (base / "images" / f"200_{suf}.jpg").exists(), suf
    txt = (base / "images" / "metrics_200.txt").read_text()
    keys = [line.split(":")[0] for line in txt.splitlines() if line]
    # exact field order (reference runner.py:1766-1768)
    assert keys[:4] == ["psnr", "ssim", "psnr_mask", "ssim_mask"]
    assert keys[-2:] == ["time", "memory"]
    assert all(k.startswith("lpips-") for k in keys[4:-2]) and keys[4:-2]
    # aggregate summary: 'Average val/...' lines (reference :1848-1856)
    summary = (runner2.experiment_path / "metrics.txt").read_text()
    assert "Average val/psnr: " in summary
    assert "Average val/ssim_mask: " in summary


def test_blocknerf_eval_protocol_reference_formulas(tmp_path, monkeypatch):
    """Pin the Block-NeRF eval protocol against the REFERENCE's formulas.

    A deterministic fake render replaces the model; expectations for every
    metrics_{hash}.txt value are computed INDEPENDENTLY with the imported
    reference torch metric functions on the right-half crop with the
    right-half moving-object mask (reference runner.py:1700-1761), and the
    metrics.txt summary must divide metric sums by the id map's
    val_image_num (:1838-1856). A second eval run must skip every already-
    rendered image via the triptych resume marker (:1659-1661) yet still
    produce the full summary from the persisted per-image records.
    """
    pytest.importorskip("tensorflow")
    import torch
    from tests.reference_stubs import install_stubs, reference_available
    if not reference_available():
        pytest.skip("/root/reference not mounted")
    install_stubs()
    import switch_nerf.metrics as ref_metrics

    from switch_nerf_tpu.datasets.block_filesystem_dataset import \
        load_tfrecord
    from switch_nerf_tpu.runner import Runner

    root = tmp_path / "data"
    root.mkdir()
    _write_record(root / "train0.tfrecord", [100], 8, 12, False)
    _write_record(root / "validation0.tfrecord", [300, 301], 16, 24, True,
                  seed=3)
    (root / "train.txt").write_text("train0.tfrecord\n")
    (root / "val.txt").write_text("validation0.tfrecord\n")
    # val_image_num DELIBERATELY larger than the evaluated count: the
    # reference divides by it, not by len(evaluated)
    (root / "idmap.json").write_text(json.dumps({
        "val_image_num": 4,
        "train0.tfrecord": {"100": 0},
        "validation0.tfrecord": {"300": 1, "301": 2},
    }))

    h = parse_args(get_opts(), [
        "--exp_name", str(tmp_path / "exp"), "--dataset_path", str(root)])
    h.data_type = "block_nerf"
    h.block_train_list_path = str(root / "train.txt")
    h.block_val_list_path = str(root / "val.txt")
    h.block_image_hash_id_map_path = str(root / "idmap.json")
    h.near, h.far = 0.01, 10.0
    h.bg_nerf = False
    h.use_mip = True
    h.use_moe = True
    h.use_moe_external_gate = True
    h.moe_expert_num = 4
    h.nerfmoe_class_name = "MipNeRFMoE"
    h.model = tiny_moe_graph()
    h.pos_xyz_dim = 2
    h.pos_dir_dim = 1
    h.appearance_dim = 4

    def fake_pred(image_index: int, n: int) -> np.ndarray:
        rng = np.random.default_rng(1000 + image_index)
        return rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)

    calls = []

    def fake_make_render_fn(self, state):
        def render_chunks(rays, image_index, radii=None):
            calls.append(image_index)
            n = rays.shape[0]
            return {"rgb_fine": fake_pred(int(image_index), n),
                    "depth_fine": np.linspace(
                        0.1, 1.0, n, dtype=np.float32)}
        return render_chunks

    monkeypatch.setattr(Runner, "_make_render_fn", fake_make_render_fn)
    monkeypatch.setattr(Runner, "_load_eval_state", lambda self: None)

    runner = Runner(h)
    means = runner.eval_image_blocknerf()
    assert len(calls) == 2

    # independently computed expectations from the reference formulas
    dicts = load_tfrecord(root / "validation0.tfrecord",
                          {"300": 1, "301": 2}, 0.01, 10.0, load_mask=True)
    base = Path(h.exp_name)
    sums = {}
    for d in dicts:
        key = d["image_hash"]
        hh, ww = d["rgbs"].shape[:2]
        pred = np.clip(fake_pred(int(d["image_ids"]), hh * ww), 0, 1)
        pred = pred.reshape(hh, ww, 3)
        gt = d["rgbs"]
        valid = d["mask"][..., 0] < 0.5          # 0 == valid (ref :1674)
        # RIGHT-half crops (reference runner.py:1700-1703)
        tp = torch.tensor(pred[:, ww // 2:])
        tg = torch.tensor(gt[:, ww // 2:])
        tm = torch.tensor(valid[:, ww // 2:])
        want = {
            "psnr": ref_metrics.psnr(tp.reshape(-1, 3), tg.reshape(-1, 3)),
            "ssim": ref_metrics.ssim(tp, tg, 1),
            "psnr_mask": ref_metrics.psnr_mask(
                tp.reshape(-1, 3), tg.reshape(-1, 3), tm.reshape(-1)),
            "ssim_mask": ref_metrics.ssim_mask(tp, tg, 1, tm),
        }
        got = {}
        for line in (base / "images" / f"metrics_{key}.txt"
                     ).read_text().splitlines():
            k, v = line.split(": ")
            got[k] = float(v)
        for k, v in want.items():
            assert got[k] == pytest.approx(v, rel=1e-4, abs=1e-5), (key, k)
        for k, v in got.items():
            agg = ("val/lpips/" + k[len("lpips-"):]
                   if k.startswith("lpips-") else f"val/{k}")
            sums[agg] = sums.get(agg, 0.0) + v

    # summary divides by val_image_num=4, NOT by the 2 evaluated images
    summary = {}
    for line in (runner.experiment_path / "metrics.txt"
                 ).read_text().splitlines():
        k, v = line.split(": ")
        assert k.startswith("Average ")
        summary[k[len("Average "):]] = float(v)
    for k, s in sums.items():
        assert summary[k] == pytest.approx(s / 4.0, rel=1e-6), k

    # resume: a second eval must skip all images (triptych markers) and
    # still write the same summary from the persisted per-image records
    calls.clear()
    h2 = parse_args(get_opts(), [
        "--exp_name", str(tmp_path / "exp"), "--dataset_path", str(root)])
    for k in ("data_type", "block_train_list_path", "block_val_list_path",
              "block_image_hash_id_map_path", "near", "far", "bg_nerf",
              "use_mip", "use_moe", "use_moe_external_gate",
              "moe_expert_num", "nerfmoe_class_name", "model",
              "pos_xyz_dim", "pos_dir_dim", "appearance_dim"):
        setattr(h2, k, getattr(h, k))
    runner2 = Runner(h2)
    runner2.eval_image_blocknerf()
    assert calls == []
    summary2 = (runner2.experiment_path / "metrics.txt").read_text()
    for k, s in sums.items():
        assert f"Average {k}: " in summary2
