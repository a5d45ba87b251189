"""End-to-end Runner tests on synthetic scenes (CPU 8-device mesh).

Covers SURVEY.md §7 step 3 (minimum end-to-end slice): dataset discovery ->
training loop -> checkpoint -> resume -> eval protocol, for both the
Mega-NeRF path (memory dataset, fg/bg, appearance embeddings) and the
chunked filesystem path.
"""
import json
from pathlib import Path

import numpy as np
import pytest

from switch_nerf_tpu.config import get_opts, parse_args


@pytest.fixture(scope="module")
def mega_dataset(tmp_path_factory):
    """Synthetic Mega-NeRF dataset: coordinates.pt + per-image metadata.pt +
    rgbs pngs, 4 train + 1 val, 24x16."""
    import torch
    from PIL import Image

    root = tmp_path_factory.mktemp("mega")
    w, h = 24, 16
    rng = np.random.default_rng(0)
    for split, names in (("train", ["000", "001", "002", "003"]),
                         ("val", ["004"])):
        (root / split / "metadata").mkdir(parents=True)
        (root / split / "rgbs").mkdir(parents=True)
        for name in names:
            # camera above origin looking down (+x is down in drb)
            c2w = np.eye(3, 4, dtype=np.float32)
            c2w[:, 3] = rng.normal(0, 0.1, 3).astype(np.float32)
            c2w[0, 3] -= 0.5
            torch.save({"c2w": torch.tensor(c2w), "W": w, "H": h,
                        "intrinsics": torch.tensor([20.0, 20.0, w / 2,
                                                    h / 2])},
                       root / split / "metadata" / f"{name}.pt")
            img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
            Image.fromarray(img).save(root / split / "rgbs" / f"{name}.jpg")
    torch.save({"origin_drb": torch.zeros(3),
                "pose_scale_factor": 10.0}, root / "coordinates.pt")
    return root


def mega_hparams(root, tmp, **over):
    h = parse_args(get_opts(), [
        "--exp_name", str(tmp / "exp"), "--dataset_path", str(root)])
    h.dataset_type = "memory"
    h.ray_altitude_range = [-30.0, 5.0]
    h.near = 0.5
    h.pos_xyz_dim = 2
    h.pos_dir_dim = 1
    h.appearance_dim = 4
    h.layers = 2
    h.skip_layers = [1]
    h.layer_dim = 16
    h.bg_layer_dim = 16
    h.coarse_samples = 4
    h.fine_samples = 4
    h.model_chunk_size = 4096
    h.batch_size = 64
    h.image_pixel_batch_size = 128
    h.train_iterations = 6
    h.ckpt_interval = 3
    h.val_interval = 100
    h.i_print = 2
    h.amp = False
    for k, v in over.items():
        setattr(h, k, v)
    return h


def test_mega_train_ckpt_resume_eval(mega_dataset, tmp_path):
    from switch_nerf_tpu.runner import Runner

    h = mega_hparams(mega_dataset, tmp_path)
    h.profile_trace_step = 1          # 3-step device trace mid-training
    h.compute_memory = True           # train-window memory (ref :596-597)
    h.val_interval = 6                # in-train TB-protocol validation fires
    runner = Runner(h)
    assert runner.pose_scale_factor == 10.0
    assert runner.near == pytest.approx(0.05)
    # altitude range transformed into [-1,1] space
    assert runner.ray_altitude_range[0] == pytest.approx(-3.0)
    assert runner.sphere_center is not None  # ellipse bounds computed

    # image_indices.txt uses the reference's '{index},{rgb filename}'
    # record format (reference runner.py:1048-1050)
    idx_lines = (runner.experiment_path
                 / "image_indices.txt").read_text().splitlines()
    assert idx_lines, "image_indices.txt missing or empty"
    for line in idx_lines:
        idx, name = line.split(",")
        assert idx == str(int(idx))
        assert name.endswith((".jpg", ".JPG", ".png", ".PNG"))

    state = runner.train()
    assert int(state.step) == 6
    # profiler trace window written (--profile_trace_step)
    assert list((runner.experiment_path / "profile").glob("**/*"))

    # checkpoint written at steps 3 and 6
    models = runner.model_path
    steps = sorted(int(p.name) for p in models.iterdir() if p.name.isdigit())
    assert steps == [3, 6]

    # resume from the step-3 checkpoint and train to 6 again
    h2 = mega_hparams(mega_dataset, tmp_path / "resume")
    h2.ckpt_path = str(models / "3")
    runner2 = Runner(h2)
    state2 = runner2.train()
    assert int(state2.step) == 6

    # eval protocol from final checkpoint
    h3 = mega_hparams(mega_dataset, tmp_path / "eval")
    h3.ckpt_path = str(models / "6")
    runner3 = Runner(h3)
    means = runner3.eval_image()
    assert "psnr" in means and np.isfinite(means["psnr"])
    assert "ssim" in means and -1.0 <= means["ssim"] <= 1.0
    # full reference metric field set out of the box (VERDICT r1 items 4/5):
    # lpips via substitute backbones (label-distinguishable '-substitute'
    # keys — provenance contract) + per-image time/memory
    for key in ("lpips-vgg-substitute", "lpips-alex-substitute",
                "lpips-squeeze-substitute", "time", "memory"):
        assert key in means and np.isfinite(means[key]), key
    # reference eval-file layout (runner.py:1513-1585): per-image
    # metrics_{i}.txt + gt/pred/depth panel crops (+ _bg/_fg sets when
    # bg_nerf) under images/, triptychs under val_images/, and the
    # 'Average val/...' summary at experiment_path/metrics.txt
    images_dir = runner3.experiment_path / "images"
    val_images_dir = runner3.experiment_path / "val_images"
    assert (val_images_dir / "0.jpg").exists()
    for suf in ("gt", "pred", "depth"):
        assert (images_dir / f"0_{suf}.jpg").exists(), suf
        if h3.bg_nerf:
            assert (images_dir / f"0_{suf}_bg.jpg").exists(), suf
            assert (images_dir / f"0_{suf}_fg.jpg").exists(), suf
    metrics_txt = (images_dir / "metrics_0.txt").read_text()
    mkeys = [line.split(":")[0] for line in metrics_txt.splitlines() if line]
    # exact field order (reference runner.py:1513-1522)
    assert mkeys[:2] == ["psnr", "ssim"] and mkeys[-2:] == ["time", "memory"]
    assert all(k.startswith("lpips-") for k in mkeys[2:-2]) and mkeys[2:-2]
    assert "lpips-vgg-substitute" in metrics_txt
    # substitute numbers must NEVER masquerade under the real-weight keys
    assert "lpips-vgg:" not in metrics_txt
    summary = (runner3.experiment_path / "metrics.txt").read_text()
    assert "Average val/psnr: " in summary
    assert "Average val/lpips/vgg-substitute: " in summary

    # validation-protocol eval (reference eval.py -> _run_validation)
    h4 = mega_hparams(mega_dataset, tmp_path / "eval2")
    h4.ckpt_path = str(models / "6")
    runner4 = Runner(h4)
    vmeans = runner4.eval()
    assert "val/psnr" in vmeans and np.isfinite(vmeans["val/psnr"])
    assert "val/lpips/vgg-substitute" in vmeans
    summary4 = (runner4.experiment_path / "metrics.txt").read_text()
    assert "Average val/psnr: " in summary4


def test_filesystem_dataset_chunks(mega_dataset, tmp_path):
    """Chunk write -> cyclic load -> ray reconstruction -> resume state."""
    import torch
    from switch_nerf_tpu.datasets.filesystem_dataset import FilesystemDataset
    from switch_nerf_tpu.datasets.image_metadata import ImageMetadata

    items = []
    for i, p in enumerate(sorted(
            (mega_dataset / "train" / "metadata").iterdir())):
        md = torch.load(p, weights_only=False)
        items.append(ImageMetadata(
            mega_dataset / "train" / "rgbs" / f"{p.stem}.jpg",
            md["c2w"].numpy(), md["W"], md["H"], md["intrinsics"].numpy(),
            i, None, False))

    ds = FilesystemDataset(items, 0.05, 2.0, None, True,
                           [tmp_path / "chunks"], num_chunks=3,
                           scale_factor=1, disk_flush_size=1000)
    ds.load_chunk()
    n0 = len(ds)
    assert n0 > 0
    item = ds[0]
    assert item["rays"].shape == (8,) and item["rgbs"].shape == (3,)
    # rays reconstructed from pixel indices (shared intrinsics path)
    assert np.isfinite(item["rays"]).all()
    d = item["rays"][3:6]
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, rtol=1e-5)

    # batches cover the chunk
    total = sum(b["rays"].shape[0] for b in ds.sample_batches(16))
    assert total == n0 - n0 % 16

    # state round-trip: get_state identifies the chunk CURRENTLY loaded
    # (resume regression: a checkpoint's dataset_index refers to this chunk)
    # and carries the pre-draw batch-rng state for exact batch replay
    import json as _json
    # checkpoint-time semantics: the state captured AFTER iterating a
    # chunk's batches replays that same iteration on restore
    batches_before = [b["rays"].copy() for b in ds.sample_batches(16)]
    st0 = ds.get_state()
    assert _json.loads(st0)["chunk"] == 0
    first = ds[0]["rays"].copy()
    ds.load_chunk()
    assert _json.loads(ds.get_state())["chunk"] == 1
    ds.set_state(st0)
    ds.load_chunk()
    assert _json.loads(ds.get_state())["chunk"] == 0
    assert len(ds) == n0
    np.testing.assert_array_equal(ds[0]["rays"], first)
    # restored batch-rng replays the IDENTICAL batch order (exact resume)
    batches_after = [b["rays"] for b in ds.sample_batches(16)]
    assert len(batches_before) == len(batches_after)
    for a, b in zip(batches_before, batches_after):
        np.testing.assert_array_equal(a, b)
    # legacy plain-index states still resolve
    ds.set_state("0")
    ds.load_chunk()
    assert _json.loads(ds.get_state())["chunk"] == 0

    # reuse across instances validates the manifest
    ds2 = FilesystemDataset(items, 0.05, 2.0, None, True,
                            [tmp_path / "chunks"], num_chunks=3,
                            scale_factor=1, disk_flush_size=1000)
    ds2.load_chunk()
    assert sum(len(list((tmp_path / "chunks" / f"chunk_{i:04d}").iterdir()))
               for i in range(3)) >= 3

    # mismatched settings must be rejected, not silently reused
    with pytest.raises(ValueError):
        FilesystemDataset(items, 0.07, 2.0, None, True,
                          [tmp_path / "chunks"], num_chunks=3,
                          scale_factor=1, disk_flush_size=1000)


def test_filesystem_dataset_process_striding(mega_dataset, tmp_path):
    """Multi-host feeding contract (explicit process params, no
    distributed runtime needed): the per-process shares are disjoint,
    cover every row, and every process agrees on the batch count."""
    import torch
    from switch_nerf_tpu.datasets.filesystem_dataset import FilesystemDataset
    from switch_nerf_tpu.datasets.image_metadata import ImageMetadata

    items = []
    for i, p in enumerate(sorted(
            (mega_dataset / "train" / "metadata").iterdir())):
        md = torch.load(p, weights_only=False)
        items.append(ImageMetadata(
            mega_dataset / "train" / "rgbs" / f"{p.stem}.jpg",
            md["c2w"].numpy(), md["W"], md["H"], md["intrinsics"].numpy(),
            i, None, False))

    def make(pi, pc):
        ds = FilesystemDataset(items, 0.05, 2.0, None, True,
                               [tmp_path / "chunks"], num_chunks=2,
                               scale_factor=1, disk_flush_size=1000,
                               process_index=pi, process_count=pc)
        ds.load_chunk()
        return ds

    full = make(0, 1)
    n_global = len(full)
    d0, d1 = make(0, 2), make(1, 2)
    assert len(d0) + len(d1) == n_global
    assert d0._global_rows == d1._global_rows == n_global
    # strided shares are disjoint and reassemble the global rows
    r_full = full._loaded["rays"]
    np.testing.assert_array_equal(d0._loaded["rays"], r_full[0::2])
    np.testing.assert_array_equal(d1._loaded["rays"], r_full[1::2])
    # per-process batch counts agree (derived from the GLOBAL row count)
    bs = 8
    n0 = sum(1 for _ in d0.sample_batches(bs))
    n1 = sum(1 for _ in d1.sample_batches(bs))
    assert n0 == n1 == n_global // (bs * 2)
    for b in d0.sample_batches(bs):
        assert b["rays"].shape[0] == bs


def test_metrics_psnr_ssim():
    from switch_nerf_tpu import metrics as M
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (16, 24, 3)).astype(np.float32)
    assert M.psnr(img, img) > 80
    assert M.ssim(img, img, 1.0) == pytest.approx(1.0, abs=1e-4)
    noisy = np.clip(img + rng.normal(0, 0.1, img.shape), 0, 1).astype(
        np.float32)
    p = M.psnr(img, noisy)
    assert 15 < p < 25
    s = M.ssim(img, noisy, 1.0)
    assert 0.0 < s < 1.0
    # masked variants agree with full when mask is all-True
    mask = np.ones(img.shape[:2], bool)
    assert M.psnr_mask(img, noisy, mask) == pytest.approx(p, abs=1e-4)
    assert M.ssim_mask(img, noisy, 1.0, mask) == pytest.approx(s, abs=1e-4)
    # lpips emits all three numbers out of the box (substitute backbones
    # when no converted weights are present); [0, 1] inputs per the
    # reference's normalize=True contract
    lp = M.lpips(img, noisy)
    assert all(v is not None and np.isfinite(v) for v in lp.values())


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    from switch_nerf_tpu.checkpoints import (latest_checkpoint,
                                             load_checkpoint,
                                             save_checkpoint)
    from switch_nerf_tpu.trainer import TrainState, create_optimizer
    from switch_nerf_tpu.config import get_opts_base

    h = parse_args(get_opts_base(), [])
    tx = create_optimizer(h)
    params = {"nerf": {"w": jnp.arange(6.0).reshape(2, 3)}}
    state = TrainState(step=jnp.asarray(7, jnp.int32), params=params,
                       opt_state=tx.init(params),
                       rng=jax.random.PRNGKey(3), tx=tx)
    save_checkpoint(tmp_path, state, dataset_state="2", dataset_index=5)
    assert latest_checkpoint(tmp_path).name == "7"

    fresh = TrainState(step=jnp.zeros((), jnp.int32),
                       params=jax.tree_util.tree_map(jnp.zeros_like, params),
                       opt_state=tx.init(params),
                       rng=jax.random.PRNGKey(0), tx=tx)
    restored, extra = load_checkpoint(tmp_path, fresh)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(
        np.asarray(restored.params["nerf"]["w"]),
        np.arange(6.0).reshape(2, 3))
    assert extra["dataset_state"] == "2" and extra["dataset_index"] == 5

    # orbax sharded format round-trip (forced in single-process mode;
    # the 2-process path is covered by tests/test_multihost.py)
    save_checkpoint(tmp_path / "orb", state, dataset_state="4",
                    dataset_index=9, sharded=True)
    assert (tmp_path / "orb" / "7" / "orbax").exists()
    restored2, extra2 = load_checkpoint(tmp_path / "orb", fresh)
    assert int(restored2.step) == 7
    np.testing.assert_array_equal(
        np.asarray(restored2.params["nerf"]["w"]),
        np.arange(6.0).reshape(2, 3))
    assert extra2["dataset_state"] == "4" and extra2["dataset_index"] == 9


def test_sigterm_saves_resumable_checkpoint(mega_dataset, tmp_path):
    """Preemption safety: SIGTERM mid-training finishes the in-flight step,
    saves a resumable checkpoint, and returns cleanly (runner latch —
    _install_term_latch)."""
    import os
    import signal
    import threading

    from switch_nerf_tpu.checkpoints import load_checkpoint
    from switch_nerf_tpu.runner import Runner
    from switch_nerf_tpu.trainer import create_train_state

    h = mega_hparams(mega_dataset, tmp_path)
    h.train_iterations = 100000          # would run ~forever
    h.ckpt_interval = 10 ** 9            # only the SIGTERM save can happen
    h.i_print = 10 ** 9
    runner = Runner(h)

    prev_handler = signal.getsignal(signal.SIGTERM)
    timer = threading.Timer(3.0, os.kill, (os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        state = runner.train()
    finally:
        timer.cancel()
    assert 0 < int(state.step) < 100000
    assert signal.getsignal(signal.SIGTERM) == prev_handler  # latch released

    models = runner.model_path
    steps = sorted(int(p.name) for p in models.iterdir() if p.name.isdigit())
    assert steps == [int(state.step)]

    # the saved checkpoint is resumable
    h2 = mega_hparams(mega_dataset, tmp_path / "resume")
    h2.ckpt_path = str(models / str(steps[0]))
    h2.train_iterations = steps[0] + 2
    runner2 = Runner(h2)
    state2 = runner2.train()
    assert int(state2.step) == steps[0] + 2


def test_eval_image_from_container(mega_dataset, tmp_path):
    """--container_path (no ckpt) drives eval_image end-to-end, matching
    the reference's ckpt-or-container eval contract."""
    import jax

    from switch_nerf_tpu.container import save_container
    from switch_nerf_tpu.runner import Runner

    h = mega_hparams(mega_dataset, tmp_path)
    runner = Runner(h)
    state = runner.train()
    out = save_container(tmp_path / "container", h,
                         jax.device_get(state.params),
                         runner.appearance_count, scene={})

    h2 = mega_hparams(mega_dataset, tmp_path / "ceval")
    h2.container_path = str(out)
    assert h2.ckpt_path is None
    runner2 = Runner(h2)
    means = runner2.eval_image()
    assert np.isfinite(means["psnr"])


def test_resume_exact_trajectory(mega_dataset, tmp_path):
    """Exact-resume guarantee (round-2 verdict item 2): resuming from a
    checkpoint — including one written by the SIGTERM preemption path —
    must replay the IDENTICAL training trajectory: bit-equal per-step
    losses and bit-equal final params/opt-state/rng vs the uninterrupted
    run. Covers the RNG chain, the dataset batch-rng in get_state(), the
    dataset cursor, and the discard fast-forward (reference anchors:
    runner.py:142-151, 584-588, 2799-2818).

    Per-step metrics are captured bit-exactly with a jax.debug.callback
    (keyed by the post-step counter — unordered callbacks are the only
    kind allowed on a multi-device mesh) wrapped around make_train_step;
    the SIGTERM leg raises the signal from inside the step-K callback, so
    the preemption lands mid-training deterministically."""
    import os
    import signal

    import jax
    import switch_nerf_tpu.runner as R

    N, K = 12, 6
    chunks = tmp_path / "chunks"
    orig_make = R.make_train_step

    def fs_hparams(tmp):
        h = mega_hparams(mega_dataset, tmp)
        h.dataset_type = "filesystem"
        h.chunk_paths = [str(chunks)]
        h.num_chunks = 2
        h.disk_flush_size = 1000
        h.train_iterations = N
        h.ckpt_interval = 4
        h.val_interval = 10 ** 9
        return h

    def run(h, kill_at=None):
        by_step = {}

        def recording(*a, **k):
            f = orig_make(*a, **k)

            def record(step, m):
                step = int(step)
                by_step[step] = {k2: np.asarray(v).copy()
                                 for k2, v in m.items()}
                if kill_at is not None and step == kill_at:
                    os.kill(os.getpid(), signal.SIGTERM)

            def g(state, batch):
                state, m = f(state, batch)
                jax.debug.callback(record, state.step, m)
                return state, m
            return g

        R.make_train_step = recording
        try:
            runner = R.Runner(h)
            state = runner.train()
        finally:
            R.make_train_step = orig_make
        records = [by_step[k] for k in sorted(by_step)]
        assert sorted(by_step) == list(range(min(by_step), max(by_step) + 1))
        return runner, jax.device_get(state), records

    def assert_state_equal(a, b):
        flat_a = jax.tree_util.tree_leaves_with_path(
            {"params": a.params, "opt": a.opt_state, "rng": a.rng})
        flat_b = jax.tree_util.tree_leaves_with_path(
            {"params": b.params, "opt": b.opt_state, "rng": b.rng})
        assert len(flat_a) == len(flat_b)
        for (pa, va), (pb, vb) in zip(flat_a, flat_b):
            assert pa == pb
            np.testing.assert_array_equal(
                np.asarray(va), np.asarray(vb),
                err_msg=f"state leaf {jax.tree_util.keystr(pa)}")

    def assert_metrics_equal(got, want, label):
        assert len(got) == len(want), label
        for i, (g, w) in enumerate(zip(got, want)):
            assert g.keys() == w.keys()
            for k in g:
                np.testing.assert_array_equal(
                    g[k], w[k], err_msg=f"{label}: step {i} metric {k}")

    # A: uninterrupted 12-step run (writes ckpts at 4, 8, 12)
    hA = fs_hparams(tmp_path / "A")
    runnerA, stateA, recA = run(hA)
    assert int(stateA.step) == N and len(recA) == N

    # B: cold resume from the step-8 interval checkpoint
    hB = fs_hparams(tmp_path / "B")
    hB.ckpt_path = str(runnerA.model_path / "8")
    assert hB.resume_ckpt_state
    _, stateB, recB = run(hB)
    assert int(stateB.step) == N
    assert_metrics_equal(recB, recA[8:], "interval-resume")
    assert_state_equal(stateA, stateB)

    # C: SIGTERM raised from inside the step-K callback -> preemption save
    # (the latch is checked right after the step, but callback delivery is
    # async, so the save may land a step or two later — read it back)
    hC = fs_hparams(tmp_path / "C")
    hC.ckpt_interval = 10 ** 9
    runnerC, stateC, recC = run(hC, kill_at=K)
    s_c = int(stateC.step)
    assert K <= s_c < N, "SIGTERM must interrupt mid-run"
    assert_metrics_equal(recC, recA[:len(recC)], "pre-preemption")
    steps = sorted(int(p.name) for p in runnerC.model_path.iterdir()
                   if p.name.isdigit())
    assert steps == [s_c]

    # D: resume from the preemption checkpoint and finish the run
    hD = fs_hparams(tmp_path / "D")
    hD.ckpt_path = str(runnerC.model_path / str(s_c))
    _, stateD, recD = run(hD)
    assert int(stateD.step) == N
    assert_metrics_equal(recD, recA[s_c:], "preemption-resume")
    assert_state_equal(stateA, stateD)


def test_resume_exact_after_skipped_step(mega_dataset, tmp_path,
                                         monkeypatch):
    """Exact resume must survive a skipped non-finite step on the MEMORY
    path: the skip (trainer lax.cond, reference runner.py:620-673)
    consumes a batch without advancing state.step, so the checkpoint
    carries the host batch counter separately (extra['host_iteration'])
    and resume restores it — deriving the counter from state.step would
    replay a shifted batch sequence (one batch trained twice, all later
    batches offset)."""
    import jax
    import switch_nerf_tpu.runner as R
    from switch_nerf_tpu.datasets.memory_dataset import MemoryDataset

    N, NAN_AT, CKPT = 10, 3, 5
    orig_make = R.make_train_step
    orig_get = MemoryDataset.get_batch

    def poisoned(self, global_batch, batch_size):
        b = orig_get(self, global_batch, batch_size)
        if global_batch == NAN_AT:
            b = dict(b, rgbs=np.full_like(b["rgbs"], np.nan))
        return b

    monkeypatch.setattr(MemoryDataset, "get_batch", poisoned)

    def run(h):
        recs = {}

        def recording(*a, **k):
            f = orig_make(*a, **k)

            def record(step, m):
                # key by (post-step counter, finite flag): a skipped
                # batch repeats the step value but carries finite=0
                recs[(int(step), int(m.get("finite", 1)))] = {
                    k2: np.asarray(v).copy() for k2, v in m.items()}

            def g(state, batch):
                state, m = f(state, batch)
                jax.debug.callback(record, state.step, m)
                return state, m
            return g

        R.make_train_step = recording
        try:
            runner = R.Runner(h)
            state = runner.train()
        finally:
            R.make_train_step = orig_make
        return runner, jax.device_get(state), recs

    # A: uninterrupted. 10 batches consumed, batch 3 skipped -> 9 steps
    hA = mega_hparams(mega_dataset, tmp_path / "A",
                      train_iterations=N, ckpt_interval=CKPT,
                      val_interval=10 ** 9, i_print=100)
    runnerA, stateA, recA = run(hA)
    assert int(stateA.step) == N - 1, "exactly one skipped step expected"
    assert (NAN_AT, 0) in recA, "the NaN batch must be recorded as a skip"

    # the interval checkpoint fired at batch counter 5 = state.step 4,
    # and must record both counters
    ckpt = runnerA.model_path / str(CKPT - 1)
    assert ckpt.exists()
    extra = json.loads((ckpt / "extra.json").read_text())
    assert extra["iteration"] == CKPT - 1
    assert extra["host_iteration"] == CKPT

    # B: resume from it. Must consume batches 5..9 (5 more steps) and
    # land bit-equal with A — not re-train batch 4 / overshoot to step 10
    hB = mega_hparams(mega_dataset, tmp_path / "B",
                      train_iterations=N, ckpt_interval=10 ** 9,
                      val_interval=10 ** 9, i_print=100)
    hB.ckpt_path = str(ckpt)
    assert hB.resume_ckpt_state
    _, stateB, recB = run(hB)
    assert int(stateB.step) == N - 1
    for key, want in recA.items():
        if key[0] >= CKPT:          # post-resume steps
            assert key in recB
            for k in want:
                np.testing.assert_array_equal(
                    recB[key][k], want[k],
                    err_msg=f"step {key} metric {k}")
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(
                {"params": stateA.params, "opt": stateA.opt_state,
                 "rng": stateA.rng}),
            jax.tree_util.tree_leaves_with_path(
                {"params": stateB.params, "opt": stateB.opt_state,
                 "rng": stateB.rng})):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=jax.tree_util.keystr(pa))


def test_epoch_permutation_sampler():
    """Round-2 verdict item 4: classic-NeRF/memory training now samples
    per-epoch permutations (reference DistributedSampler.set_epoch
    semantics) instead of with-replacement draws — each epoch visits every
    ray exactly once, and the sequence is a pure function of
    (seed, global step) so resume replays it exactly."""
    from switch_nerf_tpu.datasets.dataset_utils import \
        EpochPermutationSampler

    n, bs = 103, 10
    per_epoch = n // bs
    s = EpochPermutationSampler(n, seed=7)
    epoch0 = np.concatenate([s.batch_indices(b, bs)
                             for b in range(per_epoch)])
    assert epoch0.shape == (100,)
    assert len(np.unique(epoch0)) == 100          # no duplicates in-epoch
    epoch1 = np.concatenate([s.batch_indices(b, bs)
                             for b in range(per_epoch, 2 * per_epoch)])
    assert len(np.unique(epoch1)) == 100
    assert not np.array_equal(epoch0, epoch1)     # reshuffled per epoch

    # stateless resume: a FRESH sampler reproduces any position
    s2 = EpochPermutationSampler(n, seed=7)
    np.testing.assert_array_equal(s2.batch_indices(13, bs),
                                  s.batch_indices(13, bs))
    # different seed -> different order
    s3 = EpochPermutationSampler(n, seed=8)
    assert not np.array_equal(s3.batch_indices(0, bs),
                              s2.batch_indices(0, bs))
    # degenerate n < batch_size keeps the static batch shape
    tiny = EpochPermutationSampler(5, seed=0)
    assert tiny.batch_indices(0, 8).shape == (8,)


def test_memory_dataset_epoch_batches(mega_dataset):
    """MemoryDataset.get_batch: epoch coverage + fresh-instance replay
    (the memory-path resume-exactness building block)."""
    import torch
    from switch_nerf_tpu.datasets.image_metadata import ImageMetadata
    from switch_nerf_tpu.datasets.memory_dataset import MemoryDataset

    items = []
    for i, p in enumerate(sorted(
            (mega_dataset / "train" / "metadata").iterdir())):
        md = torch.load(p, weights_only=False)
        items.append(ImageMetadata(
            mega_dataset / "train" / "rgbs" / f"{p.stem}.jpg",
            md["c2w"].numpy(), md["W"], md["H"], md["intrinsics"].numpy(),
            i, None, False))
    ds = MemoryDataset(items, 0.05, 2.0, None, True, seed=3)
    n, bs = len(ds), 32
    per_epoch = n // bs
    rows = np.concatenate([ds.get_batch(b, bs)["rays"]
                           for b in range(per_epoch)])
    # every ray visited at most once within the epoch (permutation, not
    # with-replacement): row multiset has no duplicates
    assert np.unique(rows, axis=0).shape[0] == rows.shape[0]
    # a fresh dataset instance replays the identical batch at any step
    ds2 = MemoryDataset(items, 0.05, 2.0, None, True, seed=3)
    b17a, b17b = ds.get_batch(17, bs), ds2.get_batch(17, bs)
    for k in b17a:
        np.testing.assert_array_equal(b17a[k], b17b[k])


def test_cooperative_chunk_write_matches_single_writer(mega_dataset,
                                                       tmp_path):
    """Pod-scale chunk generation (round-3 verdict item 7): two
    'processes' write their owned chunk ids cooperatively into one dir;
    the resulting dataset must be BIT-IDENTICAL to a single-writer one
    (every process consumes the same rng draws, keeps its own slices),
    and the manifest must only appear after every writer finished."""
    import threading
    import torch
    from switch_nerf_tpu.datasets.filesystem_dataset import FilesystemDataset
    from switch_nerf_tpu.datasets.image_metadata import ImageMetadata

    items = []
    for i, p in enumerate(sorted(
            (mega_dataset / "train" / "metadata").iterdir())):
        md = torch.load(p, weights_only=False)
        items.append(ImageMetadata(
            mega_dataset / "train" / "rgbs" / f"{p.stem}.jpg",
            md["c2w"].numpy(), md["W"], md["H"], md["intrinsics"].numpy(),
            i, None, False))

    def make(path, pi, pc, out):
        out[pi] = FilesystemDataset(
            items, 0.05, 2.0, None, True, [path], num_chunks=3,
            scale_factor=1, disk_flush_size=50,
            process_index=pi, process_count=pc)

    # single-writer reference
    ref_out = {}
    make(tmp_path / "single", 0, 1, ref_out)

    # 2-process cooperative write into one shared dir (process 0 blocks on
    # process 1's done marker before publishing the manifest -> threads)
    coop_out = {}
    threads = [threading.Thread(target=make,
                                args=(tmp_path / "coop", pi, 2, coop_out))
               for pi in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert set(coop_out) == {0, 1}
    assert (tmp_path / "coop" / "manifest.json").exists()
    assert not list((tmp_path / "coop").glob(".writer_done_*"))

    # bit-identical datasets: every chunk's concatenated rows match
    ref = ref_out[0]
    for chunk in sorted((tmp_path / "single").glob("chunk_*")):
        a = ref._read_chunk(chunk)
        b = ref._read_chunk(tmp_path / "coop" / chunk.name)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=(chunk.name,
                                                               k))

    # and the reuse path accepts the cooperative dir (manifest identical)
    reuse_out = {}
    make(tmp_path / "coop", 0, 1, reuse_out)
    reuse_out[0].load_chunk()
    assert len(reuse_out[0]) > 0

    # crash-restart protocol: a CRASHED cooperative write leaves its
    # .chunks_ready marker behind (only unlinked at manifest publish). A
    # restarted non-zero writer must NOT treat that stale marker as
    # "process 0 finished cleanup" — it would append parts into dirs
    # process 0 is about to rmtree. The wait requires a FRESH marker
    # (recreated inode/mtime).
    import time
    crash = tmp_path / "crash"
    crash.mkdir()
    (crash / ".chunks_ready").touch()                   # stale marker
    stale_dir = crash / "chunk_0000"
    stale_dir.mkdir()
    (stale_dir / "part_9999.npz").write_bytes(b"stale")  # crashed leftovers
    crash_out = {}
    t1 = threading.Thread(target=make, args=(crash, 1, 2, crash_out))
    t1.start()
    time.sleep(2.5)  # > the 1 s poll interval
    assert t1.is_alive() and 1 not in crash_out, \
        "writer 1 proceeded on a stale ready marker"
    t0 = threading.Thread(target=make, args=(crash, 0, 2, crash_out))
    t0.start()
    t0.join(timeout=300)
    t1.join(timeout=300)
    assert set(crash_out) == {0, 1}
    assert not (stale_dir / "part_9999.npz").exists()
    for chunk in sorted((tmp_path / "single").glob("chunk_*")):
        a = ref._read_chunk(chunk)
        b = ref._read_chunk(crash / chunk.name)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=(chunk.name,
                                                               k))

    # the INVERSE race (r5 flake): process 0 finishes cleanup and
    # publishes the ready marker BEFORE the writer even starts. The old
    # inode/mtime protocol recorded that fresh marker as "stale" and
    # deadlocked; the nonce-ack handshake re-acks the late writer's
    # intent while process 0 waits for done markers.
    ahead = tmp_path / "ahead"
    ahead.mkdir()
    ahead_out = {}
    t0 = threading.Thread(target=make, args=(ahead, 0, 2, ahead_out))
    t0.start()
    # wait until process 0 has CREATED the ready marker (cleanup done,
    # now writing its own chunks / waiting for writer 1)
    deadline = time.time() + 60
    while not (ahead / ".chunks_ready").exists():
        assert time.time() < deadline, "process 0 never published ready"
        time.sleep(0.05)
    t1 = threading.Thread(target=make, args=(ahead, 1, 2, ahead_out))
    t1.start()
    t0.join(timeout=300)
    t1.join(timeout=300)
    assert set(ahead_out) == {0, 1}, \
        "late writer deadlocked behind a ready marker it never saw change"
    for chunk in sorted((tmp_path / "single").glob("chunk_*")):
        a = ref._read_chunk(chunk)
        b = ref._read_chunk(ahead / chunk.name)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=(chunk.name,
                                                               k))
