"""Running-mean meters for scalar metric dicts + host-side JSON allgather.

Parity target: switch_nerf/utils/functions.py:52-90 (DictAverageMeter /
DictAverageMeter1 — per-key running means with counts) and the reference's
rank-strided eval aggregation (tmp metric .pt files + barriers,
runner.py:1382-1397), which here becomes one size-negotiated JSON host
allgather.
"""
from __future__ import annotations

from typing import Dict, List


def allgather_json(obj: dict, nbytes: int = 65536) -> List[dict]:
    """Exchange one JSON-serializable dict per process; returns every
    process's dict (single-process: [obj]).

    Two collectives: the payload lengths ride a tiny fixed buffer first,
    then every process sizes one shared uint8 buffer to the global max
    (rounded up to `nbytes` granularity) — shape-static on both
    exchanges, and no payload is ever too large. `nbytes` is only the
    minimum/rounding unit of the data buffer.
    """
    import jax
    if jax.process_count() == 1:
        return [obj]
    import json

    import numpy as np
    from jax.experimental import multihost_utils

    payload = json.dumps(obj, sort_keys=True).encode("utf-8")
    lengths = np.asarray(multihost_utils.process_allgather(
        np.asarray([len(payload)], np.int64))).reshape(-1)
    cap = max(int(lengths.max()), 1)
    cap = ((cap + nbytes - 1) // nbytes) * nbytes   # same on all procs
    buf = np.zeros(cap, np.uint8)
    buf[:len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))

    return [json.loads(row[:int(n)].tobytes().decode("utf-8"))
            for row, n in zip(gathered, lengths)]


class DictAverageMeter:
    def __init__(self):
        self.sums: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    def update(self, values: Dict[str, float], n: int = 1) -> None:
        for k, v in values.items():
            v = float(v)
            self.sums[k] = self.sums.get(k, 0.0) + v * n
            self.counts[k] = self.counts.get(k, 0) + n

    def mean(self) -> Dict[str, float]:
        return {k: self.sums[k] / max(self.counts[k], 1) for k in self.sums}

    def reset(self) -> None:
        self.sums.clear()
        self.counts.clear()

    def mean_across_processes(self) -> Dict[str, float]:
        """Global per-key means over all JAX processes.

        Keys are merged BY NAME, never positionally, so processes holding
        different key sets (or none — more processes than val images) are
        handled. No-op in single-process runs.
        """
        import jax
        if jax.process_count() == 1:
            return self.mean()
        sums: Dict[str, float] = {}
        counts: Dict[str, float] = {}
        for d in allgather_json({"s": self.sums, "c": self.counts}):
            for k, v in d["s"].items():
                sums[k] = sums.get(k, 0.0) + float(v)
            for k, v in d["c"].items():
                counts[k] = counts.get(k, 0.0) + float(v)
        return {k: sums[k] / max(counts.get(k, 0.0), 1.0) for k in sums}
