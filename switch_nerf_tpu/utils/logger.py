"""Experiment logging.

Parity target: switch_nerf/utils/logger.py:12-31 (root logger with file +
stdout handlers) and misc_utils.py:6-27 (rank-gated printing). In the SPMD
design there is one process per host; process-0 gating uses
jax.process_index().
"""
from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional


def _is_main() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def setup_logger(name: Optional[str], log_dir, timestamp: bool = False
                 ) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s"
                            if timestamp else "%(message)s")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_dir is not None and _is_main():
        # FileHandler on process 0 only: every host writes to the SAME
        # shared log.txt, and root-propagated records (library warnings)
        # are not main-gated — N interleaved copies otherwise
        Path(log_dir).mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(Path(log_dir) / "log.txt")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def main_log(msg: str) -> None:
    if _is_main():
        logging.getLogger(None).info(msg)


def main_print(msg: str) -> None:
    if _is_main():
        print(msg, flush=True)


def count_parameters(params) -> int:
    import jax
    import numpy as np
    return int(sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params)))
