"""2-process CPU distributed training test (VERDICT r1 item 5).

Spawns two real OS processes joined via jax.distributed over localhost,
each owning 4 virtual CPU devices of a global 8-device ('data','expert')
mesh, and trains the tiny Building-style NeRFMoE for 10 steps through the
production per-process feeding path (Runner._put_batch ->
jax.make_array_from_process_local_data). The loss trajectory must equal a
single-process run on the same global mesh, and a sharded orbax
checkpoint must round-trip.

Reference analog: DistributedSampler feeding + NCCL process groups
(reference runner.py:571-576, tutel_communicate_nobatch.py:160-263).
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

_WORKER = Path(__file__).parent / "multihost_worker.py"
_ROOT = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    env = dict(os.environ)
    # the worker sets its own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    # CPU-only children: don't let the axon sitecustomize dial the TPU
    # tunnel (hangs at jax import when the tunnel is down — CLAUDE.md).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return env


def _run_workers(nproc: int, ckpt_dir: Path, mode: str = "full") -> dict:
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(_WORKER), str(pid), str(nproc), str(port),
         str(ckpt_dir), mode],
        env=_clean_env(), cwd=str(_ROOT),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker rc={p.returncode}:\n{out}"
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
    raise AssertionError("no RESULT line:\n" + "\n".join(outs))


@pytest.fixture(scope="module")
def ref_result(tmp_path_factory):
    """Single-process reference trajectory, shared by every nproc case."""
    return _run_workers(1, tmp_path_factory.mktemp("ckpt_ref"))


@pytest.mark.slow
@pytest.mark.parametrize("nproc", [2, 4, 8])
def test_multi_process_training_matches_single_process(ref_result, nproc,
                                                       tmp_path):
    """2 procs x 4 devices, 4 procs x 2 devices, and 8 procs x 1 device
    over the same global (4,2) mesh: trajectory, sharded ckpt, and the
    eval machinery must all hold at every host decomposition. The 8x1
    case (round-4 verdict item 5) is the true pod analog — EVERY
    collective (grad psum, expert all-to-all, eval allgather) crosses a
    process boundary."""
    ref = ref_result
    dist = _run_workers(nproc, tmp_path / "ckpt")

    assert ref["ckpt_ok"], "single-process sharded ckpt round-trip failed"
    assert dist["ckpt_ok"], f"{nproc}-process sharded ckpt round-trip failed"
    # same global batches + same global mesh => same loss trajectory
    np.testing.assert_allclose(np.asarray(dist["losses"]),
                               np.asarray(ref["losses"]),
                               rtol=2e-5, atol=2e-6)
    # training actually progressed (min over the trajectory: at 10 tiny
    # steps the last step alone is noise-dominated)
    assert min(dist["losses"][1:]) < dist["losses"][0]
    # multi-host eval machinery: asymmetric metric aggregation, preemption
    # exit agreement, the collective (lockstep-by-construction) render,
    # and per-image metric persistence from strided owners
    for key in ("meter_ok", "term_ok", "eval_ok", "gather_ok"):
        assert ref[key], f"single-process {key} failed"
        assert dist[key], f"{nproc}-process {key} failed"


@pytest.mark.slow
def test_multi_process_resume_is_exact(tmp_path):
    """Multi-process EXACT resume through the orbax sharded-checkpoint
    path (the single-process bit-exact resume test covers the host-side
    machinery; this pins the sharded save/restore): 2 processes train
    5 steps, save, restore into a fresh template, continue 5 — the
    10-loss sequence must be BIT-EQUAL to the uninterrupted 2-process
    run's."""
    full = _run_workers(2, tmp_path / "ckpt_full")
    res = _run_workers(2, tmp_path / "ckpt_resume", mode="resume")
    assert res["resume_ok"], "restored step/dataset-cursor mismatch"
    np.testing.assert_array_equal(
        np.asarray(res["losses"]), np.asarray(full["losses"]),
        err_msg="resumed multi-process trajectory diverged")


def test_init_multi_host_single_process_is_inert():
    """init_multi_host must not touch the backend before deciding, must
    no-op on single-host launches, and must leave jax fully usable —
    regression for the process_count()-before-initialize() bug that made
    every pod host silently train standalone."""
    code = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from switch_nerf_tpu.parallel.host import init_multi_host\n"
        "init_multi_host()\n"                 # BEFORE any jax operation
        "import jax.numpy as jnp\n"
        "assert jax.process_count() == 1\n"
        "assert float(jnp.ones(3).sum()) == 3.0\n"
        "print('INERT_OK')\n")
    proc = subprocess.run([sys.executable, "-c", code], env=_clean_env(),
                          cwd=str(_ROOT), stdout=subprocess.PIPE,
                          stderr=subprocess.STDOUT, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout[-2000:]
    assert "INERT_OK" in proc.stdout


def test_cli_entry_bootstraps_multihost(tmp_path):
    """The CLI entries call init_multi_host BEFORE touching the backend:
    in a simulated 2-node SLURM env the entry must attempt (and loudly
    fail) distributed initialization instead of silently training as a
    standalone process — the reference's process-group bootstrap contract
    (tutel_communicate_nobatch.py:160-263) delegated to jax.distributed."""
    code = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import jax.distributed as jd\n"
        "calls = []\n"
        "jd.initialize = lambda **kw: calls.append(kw)\n"
        "import switch_nerf_tpu.train as t\n"
        "try:\n"
        "    t.main()\n"
        "except SystemExit:\n"
        "    pass\n"
        "except Exception:\n"
        "    pass\n"
        "assert calls, 'init_multi_host never attempted initialize()'\n"
        "print('BOOTSTRAP_OK')\n")
    env = _clean_env()
    env["SWITCH_NERF_ERROR_FILE"] = str(tmp_path / "err.json")
    env["SLURM_JOB_NUM_NODES"] = "2"
    proc = subprocess.run(
        [sys.executable, "-c", code, "--exp_name", str(tmp_path / "e"),
         "--dataset_path", str(tmp_path / "missing")],
        env=env, cwd=str(_ROOT), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout[-2000:]
    assert "BOOTSTRAP_OK" in proc.stdout


def test_cli_help_skips_multihost_bootstrap(tmp_path):
    """`--help` on a multi-node launch must print usage immediately —
    NOT block inside jax.distributed.initialize waiting for peer
    processes that will never run the same command."""
    code = (
        "import jax.distributed as jd\n"
        "def _boom(**kw):\n"
        "    raise AssertionError('initialize() must not run for --help')\n"
        "jd.initialize = _boom\n"
        "import switch_nerf_tpu.train as t\n"
        "try:\n"
        "    t.main()\n"
        "except SystemExit as e:\n"
        "    assert not e.code, e.code\n"
        "print('HELP_OK')\n")
    env = _clean_env()
    env["SWITCH_NERF_ERROR_FILE"] = str(tmp_path / "err.json")
    env["SLURM_JOB_NUM_NODES"] = "2"
    proc = subprocess.run(
        [sys.executable, "-c", code, "--help"],
        env=env, cwd=str(_ROOT), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout[-2000:]
    assert "HELP_OK" in proc.stdout
    assert "usage" in proc.stdout.lower()


@pytest.mark.slow
def test_multi_process_chunk_write_uses_collective_barrier(tmp_path):
    """Cooperative chunk writing under REAL jax.distributed must survive
    the stale-marker race: a .chunks_ready left by a crashed previous
    write, with process 0 finishing cleanup (and re-touching the marker)
    BEFORE the other writer even looks at it. The filesystem handshake
    cannot distinguish that fresh marker from the stale one — the
    collective cleanup barrier can. The worker also pins the written
    dataset bit-identical to a single-writer one on every process."""
    r = _run_workers(2, tmp_path, mode="chunks")
    assert r["chunks_ok"] is True


@pytest.mark.slow
def test_blocknerf_resume_skip_is_collective_safe(tmp_path):
    """Round-4 verdict item 3: the blocknerf triptych resume-skip must be
    a GLOBAL decision. Two processes run the REAL eval_image_blocknerf
    with PER-PROCESS experiment dirs (no shared filesystem) and a
    pre-seeded triptych + metric record for image 0 on process 0 only. A
    local marker check would deadlock the cooperative collective render
    (owner skips, peer renders); the global OR must skip the image on
    every process, leave the seeded marker untouched, and still produce
    the full triptych set across the union of per-process dirs plus the
    aggregate summary."""
    r = _run_workers(2, tmp_path, mode="blockskip")
    assert r["blockskip_union"] == ["300.jpg", "301.jpg", "302.jpg"]
    # ownership striding: 300 seeded + 302 owned by p0; 301 owned by p1
    assert r["per_proc"][0] == ["300.jpg", "302.jpg"]
    assert r["per_proc"][1] == ["301.jpg"]
    assert r["seeded_intact"], "seeded resume marker was re-rendered"
    assert r["summary_has_psnr"]
    # process 0's summary aggregates ALL images: its own (300 seeded, 302
    # rendered) plus process 1's 301 via the record allgather
    assert r["p0_records"] == ["metrics-300.json", "metrics-301.json",
                               "metrics-302.json"]


def test_multi_process_eval_points_identical(tmp_path):
    """Multi-process eval_points (round-3 verdict item 6): the cooperative
    SPMD point program must produce BYTE-IDENTICAL PLY files from a
    2-process run (strided owner writes) and a single-process run — same
    global 8-device mesh, so per-device programs and collective orders
    are identical."""
    d1, d2 = tmp_path / "p1", tmp_path / "p2"
    r1 = _run_workers(1, d1, mode="points")
    r2 = _run_workers(2, d2, mode="points")
    assert r1["points_total"] == r2["points_total"] > 0
    f1 = sorted(p.relative_to(d1) for p in d1.rglob("*.ply"))
    f2 = sorted(p.relative_to(d2) for p in d2.rglob("*.ply"))
    assert f1 == f2 and f1, (f1, f2)
    for rel in f1:
        assert (d1 / rel).read_bytes() == (d2 / rel).read_bytes(), rel
