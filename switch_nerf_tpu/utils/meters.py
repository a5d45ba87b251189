"""Running-mean meters for scalar metric dicts.

Parity target: switch_nerf/utils/functions.py:52-90 (DictAverageMeter /
DictAverageMeter1 — per-key running means with counts).
"""
from __future__ import annotations

from typing import Dict


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

    # payload buffer for the cross-process metric exchange; a metric dict
    # is a handful of short keys + floats, so 64 KiB is generous
    _XCHG_BYTES = 65536

    def mean_across_processes(self) -> Dict[str, float]:
        """Global per-key means over all JAX processes.

        Replaces the reference's rank-strided eval aggregation (tmp metric
        .pt files + barriers, runner.py:1382-1397) with one host allgather.
        The exchange is a fixed-size JSON payload, so it is robust to
        processes holding DIFFERENT key sets or no entries at all (more
        processes than val images): keys are merged by name, never
        positionally. No-op in single-process runs.
        """
        import jax
        if jax.process_count() == 1:
            return self.mean()
        import json

        import numpy as np
        from jax.experimental import multihost_utils

        payload = json.dumps({"s": self.sums, "c": self.counts},
                             sort_keys=True).encode("utf-8")
        if len(payload) + 4 > self._XCHG_BYTES:
            # must still ENTER the collective (raising here would leave
            # every other process hanging in the allgather): send an
            # overflow marker so all processes raise together afterwards
            payload = json.dumps({"s": {}, "c": {}, "overflow":
                                  len(payload)}).encode("utf-8")
        buf = np.zeros(self._XCHG_BYTES, np.uint8)
        buf[:4] = np.frombuffer(
            np.uint32(len(payload)).tobytes(), np.uint8)
        buf[4:4 + len(payload)] = np.frombuffer(payload, np.uint8)
        gathered = np.asarray(multihost_utils.process_allgather(buf))

        sums: Dict[str, float] = {}
        counts: Dict[str, float] = {}
        for row in gathered:
            n = int(np.frombuffer(row[:4].tobytes(), np.uint32)[0])
            d = json.loads(row[4:4 + n].tobytes().decode("utf-8"))
            if d.get("overflow"):
                raise ValueError(
                    f"a process's metric payload ({d['overflow']}B) "
                    f"exceeds the {self._XCHG_BYTES}B exchange buffer")
            for k, v in d["s"].items():
                sums[k] = sums.get(k, 0.0) + float(v)
            for k, v in d["c"].items():
                counts[k] = counts.get(k, 0.0) + float(v)
        return {k: sums[k] / max(counts.get(k, 0.0), 1.0) for k in sums}
