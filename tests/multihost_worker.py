"""Multi-process SPMD worker for the 2-process CPU distributed test.

Run as `python tests/multihost_worker.py <pid> <nproc> <port> <ckpt_dir>
[mode]`: initialises jax.distributed over localhost, builds the tiny
Building-style NeRFMoE (fg + bg, 4 experts) on a global
('data','expert') = (4, 2) mesh spanning all processes, trains 10 steps
through the PRODUCTION feeding path (Runner._put_batch ->
jax.make_array_from_process_local_data), then round-trips a sharded
(orbax) checkpoint.

With nproc=1 the same script is the single-process reference: identical
global batches, identical mesh, so the loss trajectory must match the
multi-process run exactly (VERDICT r1 item 5's done-criterion).

mode="resume": train 5 steps, save the SHARDED checkpoint, restore it
into a fresh template, and continue the remaining 5 steps from the
RESTORED state — the 10-loss sequence must be bit-equal to mode="full"'s
(multi-process exact resume through the orbax sharded path).

Prints one line: `RESULT {"losses": [...], "ckpt_ok": true}`.
"""
import json
import os
import sys


def _run_blockskip(pid: int, nproc: int, ckpt_dir: str) -> None:
    """Blocknerf eval with PER-PROCESS experiment dirs (simulating a pod
    without a shared experiment filesystem) and a pre-seeded triptych
    resume marker on process 0 ONLY.

    The resume skip must be a GLOBAL decision (allgather/OR of the
    per-process marker check): a local check would make the owner skip
    while the other processes enter the cooperative collective render for
    that image -> collective-count mismatch -> hang (caught here by the
    test's subprocess timeout). The run must complete, skip the seeded
    image everywhere, and produce the full triptych set across the union
    of the per-process dirs.
    """
    import numpy as np
    import jax
    from pathlib import Path

    from switch_nerf_tpu.config import get_opts, parse_args
    from switch_nerf_tpu.runner import Runner
    from switch_nerf_tpu.trainer import create_train_state
    from switch_nerf_tpu.utils.meters import allgather_json
    from tests.test_blocknerf_e2e import _write_record
    from tests.test_trainer import tiny_moe_graph

    base = Path(ckpt_dir)
    data = base / "data"              # dataset may be shared (read-only)
    if pid == 0:
        data.mkdir(parents=True, exist_ok=True)
        _write_record(data / "validation0.tfrecord", [300, 301, 302],
                      16, 24, True, seed=3)
        (data / "val.txt").write_text("validation0.tfrecord\n")
        (data / "idmap.json").write_text(json.dumps({
            "val_image_num": 3,
            "validation0.tfrecord": {"300": 0, "301": 1, "302": 2}}))
    Runner._host_barrier("blockskip_data_ready")

    h = parse_args(get_opts(), [
        # PER-PROCESS exp dir = the no-shared-filesystem simulation
        "--exp_name", str(base / f"exp_{pid}"),
        "--dataset_path", str(data)])
    h.data_type = "block_nerf"
    h.block_val_list_path = str(data / "val.txt")
    h.block_image_hash_id_map_path = str(data / "idmap.json")
    h.near, h.far = 0.01, 10.0
    h.bg_nerf = False
    h.use_mip = True
    h.use_moe = True
    h.use_moe_external_gate = True
    h.moe_expert_num = 4
    h.moe_test_batch = True
    h.nerfmoe_class_name = "MipNeRFMoE"
    h.model = tiny_moe_graph()
    h.pos_xyz_dim = 2
    h.pos_dir_dim = 1
    h.appearance_dim = 4
    h.image_pixel_batch_size = 96

    # image 300 (owned by process 0) was already rendered in a previous
    # run ON PROCESS 0'S FILESYSTEM: triptych marker + metric record
    seeded_jpg = b"seeded-not-a-render"
    if pid == 0:
        vdir = base / "exp_0" / "val_images"
        mdir = base / "exp_0" / "val_metrics"
        vdir.mkdir(parents=True, exist_ok=True)
        mdir.mkdir(parents=True, exist_ok=True)
        (vdir / "300.jpg").write_bytes(seeded_jpg)
        (mdir / "metrics-300.json").write_text(
            json.dumps({"psnr": 30.0, "ssim": 0.9}))

    # identical fresh params on every process (no ckpt needed): the real
    # _setup_device still builds the global mesh + shardings
    def _fresh_state(self):
        st = create_train_state(jax.random.PRNGKey(0), self.hparams,
                                self.nerf, self.bg_nerf)
        return self._setup_device(st)
    Runner._load_eval_state = _fresh_state

    runner = Runner(h)
    runner.eval_image_blocknerf()      # must NOT hang

    my = base / f"exp_{pid}" / "val_images"
    have = sorted(p.name for p in my.glob("*.jpg"))
    # the seeded marker was honored: never re-rendered / overwritten
    seeded_intact = (pid != 0
                     or (my / "300.jpg").read_bytes() == seeded_jpg)
    flags = allgather_json({"names": have,
                            "seeded_intact": bool(seeded_intact)})
    if pid == 0:
        union = sorted(set(n for d in flags for n in d["names"]))
        summary = (runner.experiment_path / "metrics.txt").read_text()
        # p0's metric records must cover EVERY rendered image (peers'
        # records arrive via the allgather) plus the seeded one — the
        # summary divides by the global val_image_num
        mdir = base / "exp_0" / "val_metrics"
        records = sorted(p.name for p in mdir.glob("metrics-*.json"))
        print("RESULT " + json.dumps({
            "blockskip_union": union,
            "per_proc": [d["names"] for d in flags],
            "seeded_intact": all(d["seeded_intact"] for d in flags),
            "p0_records": records,
            "summary_has_psnr": "Average val/psnr: " in summary}))


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    ckpt_dir = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "full"
    per_proc_devices = 8 // nproc
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={per_proc_devices}")
    # jax may be pre-imported by sitecustomize (axon platform); the config
    # update AFTER setting XLA_FLAGS is the supported way to force CPU
    import jax
    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
        jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                                   num_processes=nproc, process_id=pid)
    assert jax.device_count() == 8, jax.devices()

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _building_hparams, _make_batch
    from switch_nerf_tpu.checkpoints import load_checkpoint, save_checkpoint
    from switch_nerf_tpu.models.model_utils import get_bg_nerf, get_nerf
    from switch_nerf_tpu.parallel import (batch_sharding, create_mesh,
                                          param_shardings)
    from switch_nerf_tpu.runner import Runner
    from switch_nerf_tpu.trainer import (SceneInfo, create_train_state,
                                         make_train_step,
                                         render_config_from_hparams)

    if mode == "blockskip":
        _run_blockskip(pid, nproc, ckpt_dir)
        return

    h = _building_hparams(tiny=True)
    h.no_expert_parallel = False
    h.batch_size = 64

    mesh = create_mesh((4, 2))
    jax.sharding.set_mesh(mesh)
    from jax.sharding import NamedSharding, PartitionSpec
    repl = NamedSharding(mesh, PartitionSpec())

    model = get_nerf(h, appearance_count=8)
    bg_model = get_bg_nerf(h, 8)
    state = create_train_state(jax.random.PRNGKey(0), h, model, bg_model)
    pshard = param_shardings(state.params, mesh, h.moe_expert_num, True)

    def to_device(st):
        return st.replace(
            params=jax.device_put(st.params, pshard),
            step=jax.device_put(np.asarray(st.step), repl),
            rng=jax.device_put(np.asarray(st.rng), repl),
            opt_state=jax.tree_util.tree_map(
                lambda x: jax.device_put(np.asarray(x), repl),
                st.opt_state))

    state = to_device(state)

    # production feeding path: Runner._put_batch unchanged
    class Shim:
        _put_batch = Runner._put_batch
        _local_batch_rows = Runner._local_batch_rows
        _batched_collective_fn = Runner._batched_collective_fn
    shim = Shim()
    shim.mesh = mesh
    shim.batch_shard = batch_sharding(mesh)

    if mode == "points":
        # cooperative multi-process eval_points: every process runs the
        # SAME lockstep point program over the global mesh; each image's
        # owner writes its PLYs into the shared dir. The test compares
        # the resulting files byte-for-byte against a 1-process run.
        from pathlib import Path
        h.render_test_points_typ = ["coarse", "fine"]
        h.render_test_points_sample_skip = 2
        h.return_pts_class_seg = True
        h.moe_return_gates = True
        h.image_pixel_batch_size = 32
        shim.hparams = h
        shim.nerf = get_nerf(h, 8)   # same params, + gate returns
        shim.experiment_path = Path(ckpt_dir)
        shim._owns_val_image = Runner._owns_val_image
        shim._make_points_program = Runner._make_points_program.__get__(shim)
        shim._batched_collective_fn = \
            Runner._batched_collective_fn.__get__(shim)
        shim._export_point_clouds = Runner._export_point_clouds.__get__(shim)

        def ray_sources():
            for i in range(2):
                rays = np.asarray(_make_batch(h, 40, seed=50 + i)["rays"],
                                  np.float32)
                yield rays, float(i)

        written = shim._export_point_clouds(state, ray_sources())
        Runner._host_barrier("points_done")
        from switch_nerf_tpu.utils.meters import allgather_json
        counts = allgather_json({"n": len(written)})
        if pid == 0:
            total = sum(d["n"] for d in counts)
            print("RESULT " + json.dumps({"points_total": total}))
        return

    if mode == "chunks":
        # cooperative chunk writing under REAL jax.distributed: the
        # collective cleanup barrier replaces the filesystem marker
        # handshake (which cannot distinguish a fresh marker from a stale
        # one when process 0 races ahead). Setup reproduces exactly that
        # race: a stale .chunks_ready from a "crashed" previous write,
        # and non-zero writers entering AFTER process 0 already finished
        # cleanup and re-touched the marker.
        import time
        from pathlib import Path
        from PIL import Image
        from switch_nerf_tpu.datasets.filesystem_dataset import \
            FilesystemDataset
        from switch_nerf_tpu.datasets.image_metadata import ImageMetadata
        from switch_nerf_tpu.utils.meters import allgather_json

        base = Path(ckpt_dir)
        # ONE shared image dir, written by process 0: cooperative chunk
        # writing requires a shared dataset_path in production anyway
        # (chunk_paths is one shared tree, and the manifest's path digest
        # must agree across writers — per-process path strings would be
        # rejected by the post-write manifest validation)
        img_dir = base / "imgs"
        img_rng = np.random.RandomState(0)
        items = []
        for i in range(4):
            arr = (img_rng.rand(12, 16, 3) * 255).astype(np.uint8)
            p = img_dir / f"{i:03d}.png"
            if pid == 0:
                img_dir.mkdir(parents=True, exist_ok=True)
                Image.fromarray(arr).save(p)
            c2w = np.eye(4, dtype=np.float32)[:3]
            c2w[:, 3] = (0.1 * i, 0.2, 1.0)
            items.append(ImageMetadata(
                p, c2w, 16, 12,
                np.array([20.0, 20.0, 8.0, 6.0], np.float32), i, None,
                False))

        shared = base / "coop_chunks"
        if pid == 0:
            shared.mkdir(exist_ok=True)
            (shared / ".chunks_ready").touch()       # stale crash leftover
        Runner._host_barrier("chunks_images_and_stale_marker_in_place")
        if pid != 0:
            time.sleep(2.0)   # let process 0 clean + re-touch FIRST

        ds = FilesystemDataset(items, 0.05, 2.0, None, True, [shared],
                               num_chunks=3, scale_factor=1,
                               disk_flush_size=16)
        ds.load_chunk()
        ok = len(ds) > 0

        # byte-identical to a single-writer dataset (each process builds
        # its own reference copy and compares the shared dir against it)
        ref = FilesystemDataset(items, 0.05, 2.0, None, True,
                                [base / f"single_{pid}"], num_chunks=3,
                                scale_factor=1, disk_flush_size=16,
                                process_index=0, process_count=1)
        same = True
        for chunk in sorted((base / f"single_{pid}").glob("chunk_*")):
            a = ref._read_chunk(chunk)
            b = ref._read_chunk(shared / chunk.name)
            same = same and set(a) == set(b) and all(
                np.array_equal(a[k], b[k]) for k in a)
        flags = allgather_json({"chunks_ok": bool(ok and same)})
        if pid == 0:
            print("RESULT " + json.dumps(
                {"chunks_ok": all(d["chunks_ok"] for d in flags)}))
        return

    cfg = render_config_from_hparams(h)
    step_fn = jax.jit(make_train_step(model, bg_model, h, cfg, SceneInfo()),
                      donate_argnums=0)

    def run_steps(st, start, stop):
        out = []
        for i in range(start, stop):
            b = _make_batch(h, h.batch_size, seed=100 + i)
            b = {k: np.asarray(v, np.float32) for k, v in b.items()}
            st, m = step_fn(st, shim._put_batch(b))
            out.append(float(m["all_loss"]))
        return st, out

    if mode == "resume":
        # 5 steps -> sharded save -> restore into a FRESH template ->
        # continue 5 steps from the restored state. The full 10-loss
        # sequence must be bit-equal to mode="full"'s.
        state, losses = run_steps(state, 0, 5)
        save_checkpoint(ckpt_dir, state, dataset_state="3",
                        dataset_index=5, sharded=True)
        fresh = to_device(create_train_state(
            jax.random.PRNGKey(1), h, model, bg_model))
        restored, extra = load_checkpoint(ckpt_dir, fresh,
                                          restore_rng_states=True)
        resume_ok = (int(restored.step) == 5
                     and extra["dataset_index"] == 5)
        restored, more = run_steps(restored, 5, 10)
        losses += more
        from switch_nerf_tpu.utils.meters import allgather_json
        all_flags = allgather_json({"resume_ok": bool(resume_ok)})
        if pid == 0:
            print("RESULT " + json.dumps(
                {"resume_ok": all(d["resume_ok"] for d in all_flags),
                 "losses": losses}))
        return

    state, losses = run_steps(state, 0, 10)

    # sharded checkpoint round-trip (orbax): save from the sharded state,
    # restore into a freshly-initialised sharded template, compare
    save_checkpoint(ckpt_dir, state, dataset_state="3", dataset_index=7,
                    sharded=True)
    fresh = to_device(create_train_state(
        jax.random.PRNGKey(1), h, model, bg_model))
    restored, extra = load_checkpoint(ckpt_dir, fresh,
                                      restore_rng_states=False)
    diffs = jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                           - b.astype(jnp.float32)))),
        restored.params, state.params))
    ckpt_ok = (max(diffs) == 0.0 and int(restored.step) == 10
               and extra["dataset_state"] == "3"
               and extra["dataset_index"] == 7)

    # ---- multi-host eval machinery ----
    # 1) metric aggregation with ASYMMETRIC key sets / empty meters
    #    (process 1 contributes nothing — more processes than val images)
    from switch_nerf_tpu.utils.meters import DictAverageMeter
    meter = DictAverageMeter()
    if pid == 0:
        meter.update({"psnr": 10.0, "only0": 1.0})
        meter.update({"psnr": 14.0})
    means = meter.mean_across_processes()
    meter_ok = (abs(means.get("psnr", 0.0) - 12.0) < 1e-9
                and abs(means.get("only0", 0.0) - 1.0) < 1e-9)

    # 2) preemption exit agreement: flag raised on the LAST process only
    #    must come back True on every process
    from switch_nerf_tpu.runner import _broadcast_str, _global_term_requested
    latch = {"requested": pid == nproc - 1, "prev": None, "installed": False}
    term_ok = _global_term_requested(latch) is True

    # 2b) experiment-path broadcast: every process must receive process
    #     0's string (the versioned-dir race fix)
    got = _broadcast_str("/exp/42" if pid == 0 else "")
    term_ok = term_ok and got == "/exp/42"

    # 3) collective whole-image render: identical rays on every process,
    #    batch fed as a global mesh-sharded array, outputs gathered back
    #    to every host (the lockstep-by-construction eval design)
    shim.hparams = h
    shim.nerf, shim.bg_nerf, shim.mip = model, bg_model, False
    shim.sphere_center, shim.sphere_radius = None, None
    h.image_pixel_batch_size = 32
    render_chunks = Runner._make_render_fn(shim, state)
    rays = np.asarray(_make_batch(h, 48, seed=7)["rays"], np.float32)
    res = render_chunks(rays, 0.0)          # 48 rays -> 2 chunks, 1 padded
    typ = "fine" if "rgb_fine" in res else "coarse"
    eval_ok = (res[f"rgb_{typ}"].shape == (48, 3)
               and bool(np.isfinite(res[f"rgb_{typ}"]).all()))

    # 4) per-image metric persistence (VERDICT r2 item 5): every process
    #    owns a strided share of val images; after the gather, EVERY
    #    process (in particular process 0, which holds the TB writer)
    #    holds the per-image metrics of ALL images
    local = {i: {"psnr": float(10 + i), "ssim": 0.5}
             for i in range(6) if i % nproc == pid}
    gathered = Runner._gather_image_metrics(local)
    gather_ok = (sorted(gathered) == list(range(6))
                 and all(abs(gathered[i]["psnr"] - (10 + i)) < 1e-9
                         for i in range(6)))

    # every ok flag is per-process state — AND them across ALL ranks so a
    # check that holds on rank 0 but fails on a non-zero rank (e.g. a
    # rank-dependent gather bug) cannot pass unnoticed
    from switch_nerf_tpu.utils.meters import allgather_json
    flags = {"ckpt_ok": bool(ckpt_ok), "meter_ok": bool(meter_ok),
             "term_ok": bool(term_ok), "eval_ok": bool(eval_ok),
             "gather_ok": bool(gather_ok)}
    all_flags = allgather_json(flags)
    merged = {k: all(d[k] for d in all_flags) for k in flags}
    if pid == 0:
        print("RESULT " + json.dumps(dict(merged, losses=losses)))


if __name__ == "__main__":
    main()
