"""Running-mean meters for scalar metric dicts + host-side JSON allgather.

Parity target: switch_nerf/utils/functions.py:52-90 (DictAverageMeter /
DictAverageMeter1 — per-key running means with counts) and the reference's
rank-strided eval aggregation (tmp metric .pt files + barriers,
runner.py:1382-1397), which here becomes one fixed-size JSON host
allgather.
"""
from __future__ import annotations

from typing import Dict, List


def allgather_json(obj: dict, nbytes: int = 65536) -> List[dict]:
    """Exchange one JSON-serializable dict per process; returns every
    process's dict (single-process: [obj]).

    The payload rides a fixed-size uint8 buffer so the collective is
    shape-static and robust to per-process differences in content. A
    too-large payload sends an overflow marker instead of raising before
    the collective (which would hang every other process) so all
    processes raise together afterwards.
    """
    import jax
    if jax.process_count() == 1:
        return [obj]
    import json

    import numpy as np
    from jax.experimental import multihost_utils

    payload = json.dumps(obj, sort_keys=True).encode("utf-8")
    if len(payload) + 4 > nbytes:
        payload = json.dumps(
            {"__overflow__": len(payload)}).encode("utf-8")
    buf = np.zeros(nbytes, np.uint8)
    buf[:4] = np.frombuffer(np.uint32(len(payload)).tobytes(), np.uint8)
    buf[4:4 + len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = np.asarray(multihost_utils.process_allgather(buf))

    out = []
    for row in gathered:
        n = int(np.frombuffer(row[:4].tobytes(), np.uint32)[0])
        d = json.loads(row[4:4 + n].tobytes().decode("utf-8"))
        if "__overflow__" in d:
            raise ValueError(
                f"a process's payload ({d['__overflow__']}B) exceeds the "
                f"{nbytes}B exchange buffer")
        out.append(d)
    return out


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
