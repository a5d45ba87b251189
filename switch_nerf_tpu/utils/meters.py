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

    def mean_across_processes(self) -> Dict[str, float]:
        """Global per-key means over all JAX processes.

        Replaces the reference's rank-strided eval aggregation (tmp metric
        .pt files + barriers, runner.py:1382-1397) with one host allgather
        of (sum, count) pairs. Keys must agree across processes (each
        process evaluates a strided share of the same protocol). No-op in
        single-process runs.
        """
        import jax
        if jax.process_count() == 1:
            return self.mean()
        import numpy as np
        from jax.experimental import multihost_utils

        keys = sorted(self.sums)
        local = np.array([[self.sums[k] for k in keys],
                          [float(self.counts[k]) for k in keys]], np.float64)
        gathered = np.asarray(multihost_utils.process_allgather(local))
        sums = gathered[:, 0, :].sum(axis=0)
        counts = gathered[:, 1, :].sum(axis=0)
        return {k: float(s / max(c, 1.0))
                for k, s, c in zip(keys, sums, counts)}
