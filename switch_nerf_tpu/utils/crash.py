"""Entry-point crash discipline: the torchelastic `@record` analog.

Parity targets: every reference CLI wraps main in
torch.distributed.elastic.multiprocessing.errors.record (e.g.
switch_nerf/train.py:18) so worker failures leave a structured error
record, and the Runner registers a faulthandler signal
(switch_nerf/runner.py:61) for live stack dumps. Here:

  * `record(fn)` — on an uncaught exception, writes a JSON crash report
    (timestamp, host, pid, argv, exception, full traceback) to
    $SWITCH_NERF_ERROR_FILE (or $TORCHELASTIC_ERROR_FILE for drop-in
    launcher compat, else ./switch_nerf_error_<pid>.json), logs it, and
    re-raises so the process exits nonzero.
  * `install_faulthandler()` — faulthandler.enable() on stderr plus a
    SIGUSR1 all-thread stack dump (the reference's
    faulthandler.register(signal.SIGUSR1)).
"""
from __future__ import annotations

import datetime
import functools
import json
import os
import socket
import sys
import traceback


def _error_file_path() -> str:
    return (os.environ.get("SWITCH_NERF_ERROR_FILE")
            or os.environ.get("TORCHELASTIC_ERROR_FILE")
            or os.path.join(os.getcwd(),
                            f"switch_nerf_error_{os.getpid()}.json"))


def install_faulthandler() -> None:
    import faulthandler
    import signal
    try:
        faulthandler.enable(all_threads=True)
        if hasattr(signal, "SIGUSR1"):
            faulthandler.register(signal.SIGUSR1, all_threads=True,
                                  chain=True)
    except (ValueError, AttributeError, OSError):
        # non-main thread / no usable stderr (embedded use): best-effort
        pass


def record(fn):
    """Decorator for CLI main(): structured crash report + nonzero exit."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        install_faulthandler()
        try:
            return fn(*args, **kwargs)
        except SystemExit:
            raise                      # argparse exits carry their own code
        except BaseException as e:     # noqa: BLE001 — the @record contract
            report = {
                "timestamp": datetime.datetime.now(
                    datetime.timezone.utc).isoformat(),
                "hostname": socket.gethostname(),
                "pid": os.getpid(),
                "process_index": os.environ.get("JAX_PROCESS_INDEX"),
                "argv": sys.argv,
                "entrypoint": getattr(fn, "__module__", "?"),
                "exc_type": type(e).__name__,
                "message": str(e),
                "traceback": traceback.format_exc(),
            }
            path = _error_file_path()
            try:
                with open(path, "w") as f:
                    json.dump(report, f, indent=1)
                print(f"[switch_nerf_tpu] crash report written to {path}",
                      file=sys.stderr)
            except OSError:
                print("[switch_nerf_tpu] failed to write crash report:",
                      file=sys.stderr)
                traceback.print_exc()
            raise
    return wrapper


def cli_entry(fn):
    """The shared CLI-main wrapper: `record` crash discipline plus the
    multi-host bootstrap BEFORE any jax backend touch — inert on
    single-host launches; TPU-pod/SLURM envs auto-detected (jax reads
    SLURM_* natively, replacing the reference's scontrol parsing,
    tutel_communicate_nobatch.py:56-156; --use_slurm needs no special
    handling). Every entry module applies this once, mirroring the
    reference's per-CLI @record (e.g. switch_nerf/train.py:18)."""
    @record
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        # --help must print usage immediately, not block in
        # jax.distributed.initialize waiting for peers that will never
        # run the same command (argv parsing happens inside fn)
        if not {"-h", "--help"}.intersection(sys.argv[1:]):
            from switch_nerf_tpu.parallel.host import init_multi_host
            init_multi_host()
        return fn(*args, **kwargs)
    return wrapper
