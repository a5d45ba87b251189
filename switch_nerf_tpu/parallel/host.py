"""Multi-host bootstrap + profiling helpers.

Replaces the reference's SLURM/OMPI/env:// process-group zoo
(tutel_communicate_nobatch.py:56-263, tutel_system.py:27-49): JAX needs one
`jax.distributed.initialize()` per host and everything else is the mesh.

Profiling replaces the reference's manual wall-clocks + torch peak-memory
counters (runner.py:581-597, 675, 695-698) with jax.profiler traces and
device memory stats.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import jax


def init_multi_host(coordinator_address: Optional[str] = None,
                    num_processes: Optional[int] = None,
                    process_id: Optional[int] = None) -> None:
    """Initialise jax.distributed across hosts.

    On TPU pods the arguments are discovered from the environment; on other
    setups pass them or set JAX_COORDINATOR_ADDRESS / SLURM variables
    (jax reads SLURM_* natively — no scontrol parsing needed, unlike
    tutel_communicate_nobatch.py:56-156).
    """
    # CRITICAL ordering: do NOT touch jax.process_count()/jax.devices()
    # here — they initialize the XLA backend in single-process mode, after
    # which jax.distributed.initialize() raises and every host would
    # silently train as an independent single-process job. Check the
    # distributed client state directly instead.
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:
        # older jax: fall back to the private client state; raise a clear
        # error if that moves too rather than silently proceeding
        try:
            from jax._src import distributed as _dist
            already = _dist.global_state.client is not None
        except (ImportError, AttributeError) as e:
            raise RuntimeError(
                "cannot determine jax.distributed initialization state on "
                "this jax version; update parallel/host.init_multi_host"
            ) from e
    if already:
        return  # already initialised
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    tpu_hosts = [h for h in
                 os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    multi = (bool(kwargs)
             or bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
             or bool(os.environ.get("COORDINATOR_ADDRESS"))
             or os.environ.get("SLURM_JOB_NUM_NODES", "1") not in ("", "1")
             or len(tpu_hosts) > 1)
    if not multi:
        return  # single-host run: no initialisation needed
    # a multi-host launch was requested — failures must surface, not be
    # swallowed (a silent fallback trains N independent copies)
    jax.distributed.initialize(**kwargs)


@contextlib.contextmanager
def profile_trace(log_dir, enabled: bool = True):
    """jax.profiler trace context; view with TensorBoard's profile plugin."""
    if not enabled:
        yield
        return
    with jax.profiler.trace(str(log_dir)):
        yield


def device_memory_stats() -> dict:
    """Per-device memory stats in MiB (the torch.cuda.max_memory_allocated
    analog, --compute_memory)."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats() or {}
            out[str(d)] = {
                "bytes_in_use_mib": s.get("bytes_in_use", 0) / 2**20,
                "peak_bytes_in_use_mib": s.get("peak_bytes_in_use", 0) / 2**20,
            }
        except Exception:
            out[str(d)] = {}
    return out


class StepTimer:
    """Wall-clock meters for data/forward-backward time (runner.py:581-595
    analog)."""
    def __init__(self):
        self._t = time.perf_counter()
        self.meters = {}

    def lap(self, name: str) -> float:
        now = time.perf_counter()
        dt = now - self._t
        self._t = now
        self.meters[name] = self.meters.get(name, 0.0) + dt
        return dt
