"""Checkpoint save/restore: params, optimizer state, step, RNG chains, and
data-iterator state in one directory.

Parity target: runner.py:2799-2833 (_save_checkpoint) + resume logic
(:142-151, :490-505, :538-539, :584-588). The reference stores a single .pt
with model/bg/optimizers/GradScaler/iteration/all-three-RNG-states/
dataset_index/dataset chunk id. Our equivalent:

    <dir>/<step>/state.msgpack     flax-serialized TrainState pytree
                                   (params + opt_state + step + jax PRNG key)
    <dir>/<step>/extra.json        dataset_state (chunk cursor), dataset_index,
                                   np_random_state, python random state,
                                   param_fingerprint (architecture check:
                                   sha1 over param paths/shapes/dtypes)

There is no GradScaler (bf16 needs none). The jax PRNG key chain *is* the
torch/np RNG replacement on the device side; the numpy/python states cover
host-side shuffling.

Sharded params: single-process runs fetch arrays to host and write one
msgpack. Multi-process runs (pods) switch to orbax sharded checkpointing —
every process writes only its addressable shards under <dir>/<step>/orbax
(no full-tree serialization on any one host), and restore targets the
live shardings. Both formats carry the same extra.json.
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


def _state_tree(state):
    return {"step": state.step, "params": state.params,
            "opt_state": state.opt_state, "rng": state.rng}


def _param_fingerprint(params) -> str:
    """sha1 over every param leaf's (path, shape, dtype) — an architecture
    fingerprint so a mismatched resume fails with a clear message instead
    of a raw serialization shape error."""
    import hashlib
    h = hashlib.sha1()
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        h.update(jax.tree_util.keystr(kp).encode())
        h.update(str(tuple(getattr(leaf, "shape", ()))).encode())
        h.update(str(getattr(leaf, "dtype", "?")).encode())
    return h.hexdigest()


def save_checkpoint(ckpt_dir, state, dataset_state: Optional[str] = None,
                    dataset_index: int = -1, keep: int = 0,
                    sharded: Optional[bool] = None,
                    host_iteration: Optional[int] = None) -> Path:
    """Write checkpoint for `state` at state.step. Returns the path.

    sharded=None auto-selects: orbax sharded format when running
    multi-process (each process writes its addressable shards), msgpack
    otherwise. All processes must call this in multi-process runs.

    host_iteration is the runner's batch counter, which counts every
    consumed batch; state.step counts only applied optimizer steps, so
    the two diverge when a non-finite step was skipped (trainer lax.cond
    keeps the old state). Exact resume must restore the batch counter —
    it keys the memory/classic batch streams — not re-derive it from
    state.step (reference saves 'iteration' separately for the same
    reason, runner.py:2799-2818).
    """
    if sharded is None:
        sharded = jax.process_count() > 1
    step = int(state.step)
    path = Path(ckpt_dir) / str(step)

    extra = {
        "iteration": step,
        "host_iteration": (int(host_iteration) if host_iteration is not None
                           else step),
        "dataset_state": dataset_state,
        "dataset_index": dataset_index,
        "param_fingerprint": _param_fingerprint(state.params),
        "np_random_state": base64.b64encode(
            pickle.dumps(np.random.get_state())).decode(),
        "python_random_state": base64.b64encode(
            pickle.dumps(random.getstate())).decode(),
    }

    if sharded:
        # orbax commits its own data atomically (collective save blocks
        # until every process finished); extra.json — written LAST by
        # process 0 — is the commit marker latest_checkpoint requires.
        # Re-saving an existing step (e.g. interval save then preemption
        # save at the same step): drop the stale marker FIRST, or a crash
        # during the force=True rewrite would leave a "committed" dir
        # with no data
        if jax.process_index() == 0:
            path.mkdir(parents=True, exist_ok=True)
            marker = path / "extra.json"
            if marker.exists():
                marker.unlink()
        if jax.process_count() > 1:
            # make the unlink-before-save ordering GLOBAL: without this
            # barrier only process 0 sequences the commit protocol, and a
            # non-zero process crashing pre-save leaves the others blocked
            # in the collective while the dir still looks committed
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(
                f"ckpt_marker_cleared_{step}")
        import orbax.checkpoint as ocp
        target = path.resolve() / "orbax"
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(target, _state_tree(state), force=True)
        if jax.process_index() == 0:
            (path / "extra.json").write_text(json.dumps(extra))
    else:
        # atomic publish: write into a temp dir, rename into place — a
        # crash mid-save must never leave a half checkpoint that the next
        # auto-resume picks as "latest"
        tmp = Path(ckpt_dir) / f".tmp_{step}"
        if tmp.exists():
            shutil.rmtree(tmp)
        tmp.mkdir(parents=True)
        host_state = jax.device_get(_state_tree(state))
        (tmp / "state.msgpack").write_bytes(
            serialization.to_bytes(host_state))
        (tmp / "extra.json").write_text(json.dumps(extra))
        if path.exists():
            shutil.rmtree(path)
        tmp.rename(path)

    if jax.process_index() == 0:
        if keep > 0:
            # never prune the step just written (a stale higher-numbered
            # dir from an earlier run must not evict the fresh save);
            # keep the (keep-1) highest OTHER steps
            others = sorted((int(p.name) for p in Path(ckpt_dir).iterdir()
                             if p.name.isdigit() and int(p.name) != step),
                            reverse=True)
            for old in others[keep - 1:]:
                shutil.rmtree(Path(ckpt_dir) / str(old),
                              ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir) -> Optional[Path]:
    """Newest COMMITTED step dir: extra.json is written last (msgpack
    saves publish by atomic rename), so a dir without it is a partial
    save from a crash and must be skipped, not resumed."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    steps = sorted((int(p.name) for p in ckpt_dir.iterdir()
                    if p.name.isdigit()
                    and (p / "extra.json").exists()))
    return ckpt_dir / str(steps[-1]) if steps else None


def load_checkpoint(path, state, restore_rng_states: bool = True
                    ) -> Tuple[Any, Dict]:
    """Restore a TrainState template from `path` (a step dir or ckpt root).

    Returns (state, extra dict). Restores numpy/python RNG states in-place
    (reference restores RNG before anything else, runner.py:142-151).
    """
    path = Path(path)
    if (path / "state.msgpack").exists() or (path / "orbax").exists():
        step_dir = path
    else:
        step_dir = latest_checkpoint(path)
        if step_dir is None:
            raise FileNotFoundError(f"no checkpoint under {path}")

    # early architecture check: a clear message beats a raw serialization
    # shape error deep inside from_bytes/orbax
    extra_path = step_dir / "extra.json"
    if extra_path.exists():
        want = json.loads(extra_path.read_text()).get("param_fingerprint")
        have = _param_fingerprint(state.params)
        if want is not None and want != have:
            raise ValueError(
                f"checkpoint {step_dir} was saved with a different model "
                "architecture (param path/shape/dtype fingerprint "
                f"mismatch: ckpt {want[:12]}… vs template {have[:12]}…); "
                "check the model graph / width / expert-count hparams")

    if (step_dir / "orbax").exists():
        # sharded (orbax) format: restore each leaf onto the template's
        # sharding (a sharded template restores distributed, a host
        # template restores fully-addressable arrays)
        import orbax.checkpoint as ocp

        def as_abstract(x):
            if hasattr(x, "sharding") and hasattr(x, "shape"):
                return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                            sharding=x.sharding)
            return x
        template = jax.tree_util.tree_map(as_abstract, _state_tree(state))
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(step_dir.resolve() / "orbax", template)
    else:
        if jax.process_count() > 1:
            raise ValueError(
                f"{step_dir} is a single-host msgpack checkpoint; "
                "multi-process restore needs the orbax sharded format "
                "(re-save with save_checkpoint(sharded=True))")
        template = jax.device_get(_state_tree(state))
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
