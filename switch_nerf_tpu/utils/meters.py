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
