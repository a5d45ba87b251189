"""Driver-contract regression tests for __graft_entry__.py.

Round-1 shipped a dryrun_multichip that only worked via `python
__graft_entry__.py` — the driver imports the module inside a 1-chip
process and calls dryrun_multichip(8) directly, which failed
(MULTICHIP_r01.json: ok=false). These tests pin the import-and-call
contract from a deliberately 1-device process.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_in_one_device_process(code: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # Simulate the driver's runtime: a process whose JAX sees ONE device.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("_GRAFT_DRYRUN_CHILD", None)
    # CPU-only child: don't let the axon sitecustomize dial the TPU tunnel
    # (it hangs at jax import when the tunnel is down — CLAUDE.md gotcha).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    return subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        timeout=600)


def test_dryrun_multichip_from_one_device_process():
    proc = _run_in_one_device_process(
        "import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert proc.returncode == 0, proc.stdout[-2000:]
    assert "dryrun_multichip(8)" in proc.stdout and "OK" in proc.stdout, (
        proc.stdout[-2000:])


import pytest


@pytest.mark.slow
@pytest.mark.parametrize("n", [4, 6, 16])
def test_dryrun_multichip_other_mesh_sizes(n):
    """Round-2 verdict item 9: the sharded train step generalizes beyond
    the (4,2) mesh — n=4 gives a (2,2) mesh (EP == half the devices),
    n=6 a (3,2) mesh (ODD data-axis factor: non-power-of-two batch
    split + non-dividing weight-parallel dims degrade to replicated),
    n=16 a (8,2) mesh (more devices than the 4 experts' EP shards)."""
    proc = _run_in_one_device_process(
        f"import __graft_entry__ as g; g.dryrun_multichip({n})")
    assert proc.returncode == 0, proc.stdout[-2000:]
    assert f"dryrun_multichip({n})" in proc.stdout and "OK" in proc.stdout, (
        proc.stdout[-2000:])
