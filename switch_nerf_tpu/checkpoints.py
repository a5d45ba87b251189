"""Checkpoint save/restore: params, optimizer state, step, RNG chains, and
data-iterator state in one directory.

Parity target: runner.py:2799-2833 (_save_checkpoint) + resume logic
(:142-151, :490-505, :538-539, :584-588). The reference stores a single .pt
with model/bg/optimizers/GradScaler/iteration/all-three-RNG-states/
dataset_index/dataset chunk id. Our equivalent:

    <dir>/<step>/state.msgpack     flax-serialized TrainState pytree
                                   (params + opt_state + step + jax PRNG key)
    <dir>/<step>/extra.json        dataset_state (chunk id), dataset_index,
                                   np_random_state, python random state,
                                   hparams fingerprint

There is no GradScaler (bf16 needs none). The jax PRNG key chain *is* the
torch/np RNG replacement on the device side; the numpy/python states cover
host-side shuffling.

Sharded params: arrays are fetched to host before serialization (fine for
single-host; orbax async sharded checkpointing is the planned swap-in for
multi-host pods).
"""
from __future__ import annotations

import base64
import json
import pickle
import random
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def save_checkpoint(ckpt_dir, state, dataset_state: Optional[str] = None,
                    dataset_index: int = -1, keep: int = 0) -> Path:
    """Write checkpoint for `state` at state.step. Returns the path."""
    step = int(state.step)
    path = Path(ckpt_dir) / str(step)
    path.mkdir(parents=True, exist_ok=True)

    host_state = jax.device_get(
        {"step": state.step, "params": state.params,
         "opt_state": state.opt_state, "rng": state.rng})
    (path / "state.msgpack").write_bytes(serialization.to_bytes(host_state))

    extra = {
        "iteration": step,
        "dataset_state": dataset_state,
        "dataset_index": dataset_index,
        "np_random_state": base64.b64encode(
            pickle.dumps(np.random.get_state())).decode(),
        "python_random_state": base64.b64encode(
            pickle.dumps(random.getstate())).decode(),
    }
    (path / "extra.json").write_text(json.dumps(extra))

    if keep > 0:
        steps = sorted((int(p.name) for p in Path(ckpt_dir).iterdir()
                        if p.name.isdigit()), reverse=True)
        for old in steps[keep:]:
            shutil.rmtree(Path(ckpt_dir) / str(old), ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = sorted((int(p.name) for p in ckpt_dir.iterdir()
                    if p.name.isdigit()))
    return ckpt_dir / str(steps[-1]) if steps else None


def load_checkpoint(path, state, restore_rng_states: bool = True
                    ) -> Tuple[Any, Dict]:
    """Restore a TrainState template from `path` (a step dir or ckpt root).

    Returns (state, extra dict). Restores numpy/python RNG states in-place
    (reference restores RNG before anything else, runner.py:142-151).
    """
    path = Path(path)
    if (path / "state.msgpack").exists():
        step_dir = path
    else:
        step_dir = latest_checkpoint(path)
        if step_dir is None:
            raise FileNotFoundError(f"no checkpoint under {path}")

    template = jax.device_get(
        {"step": state.step, "params": state.params,
         "opt_state": state.opt_state, "rng": state.rng})
    restored = serialization.from_bytes(
        template, (step_dir / "state.msgpack").read_bytes())
    state = state.replace(step=restored["step"], params=restored["params"],
                          opt_state=restored["opt_state"],
                          rng=restored["rng"])

    extra = json.loads((step_dir / "extra.json").read_text())
    if restore_rng_states:
        if extra.get("np_random_state"):
            np.random.set_state(pickle.loads(
                base64.b64decode(extra["np_random_state"])))
        if extra.get("python_random_state"):
            random.setstate(pickle.loads(
                base64.b64decode(extra["python_random_state"])))
    return state, extra
