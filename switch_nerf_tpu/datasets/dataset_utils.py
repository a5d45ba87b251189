"""Per-image pixel selection shared by the chunked datasets.

Parity target: switch_nerf/datasets/dataset_utils.py:8-39 (get_rgb_index_mask):
  * flattened rgbs + int16 image-index vector + keep-mask
  * val-image protocol: TRAIN keeps only the LEFT half; the number of
    discarded kept-pixels in the right half is resampled uniformly into
    previously-masked-out left-half pixels so the per-image ray count is
    preserved (eval later uses the right half, runner.py:1296-1297).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from switch_nerf_tpu.datasets.image_metadata import ImageMetadata

INT16_MAX = np.iinfo(np.int16).max


def get_rgb_index_mask(metadata: ImageMetadata,
                       rng: Optional[np.random.Generator] = None
                       ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                           Optional[np.ndarray]]]:
    rng = rng or np.random.default_rng()
    rgbs = metadata.load_image().reshape(-1, 3)
    keep_mask = metadata.load_mask()

    if metadata.is_val:
        h, w = metadata.H, metadata.W
        if keep_mask is None:
            keep_mask = np.ones((h, w), dtype=bool)
        else:
            discard_half = keep_mask[:, w // 2:]
            discard_pos_count = int(discard_half.sum())
            candidates = np.arange(h * w).reshape(h, w)[:, :w // 2]
            keep_half = keep_mask[:, :w // 2]
            candidates = candidates[~keep_half].reshape(-1)
            to_add = rng.permutation(candidates)[:discard_pos_count]
            flat = keep_mask.reshape(-1)
            flat[to_add] = True
            keep_mask = flat.reshape(h, w)
        keep_mask[:, w // 2:] = False

    if keep_mask is not None:
        if not keep_mask.any():
            return None
        keep_mask = keep_mask.reshape(-1)
        rgbs = rgbs[keep_mask]

    assert metadata.image_index <= INT16_MAX
    indices = np.full((rgbs.shape[0],), metadata.image_index, dtype=np.int16)
    return rgbs, indices, keep_mask


def poll_until(check, timeout_s: float = 3600.0, interval_s: float = 1.0,
               desc: str = "process 0 never published the chunk manifest"):
    """Shared multi-host manifest-wait protocol: poll `check()` until it
    returns non-None, else TimeoutError(desc). Used by both chunked
    datasets so the wait semantics cannot drift."""
    import time
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        out = check()
        if out is not None:
            return out
        time.sleep(interval_s)
    raise TimeoutError(desc)


class EpochPermutationSampler:
    """Per-epoch permutation batch sampling.

    Reference semantics: the torch training loops draw batches through a
    DataLoader over DistributedSampler with set_epoch (runner.py:819-827)
    — every epoch visits every ray exactly once in a fresh seeded
    permutation. (The previous with-replacement `rng.integers` draw
    duplicated/missed rays within an epoch — round-2 verdict item 4.)

    The permutation is keyed purely by (seed, epoch) and the position by
    the GLOBAL batch counter, so a resumed run at step k replays the exact
    remaining batch sequence of the uninterrupted run with no carried rng
    state. The trailing `n % batch_size` rows of an epoch are dropped
    (static jit batch shapes; the reference's sampler instead pads to an
    even division — at most one batch per epoch differs).
    """

    def __init__(self, n_rows: int, seed: int):
        if n_rows <= 0:
            raise ValueError("EpochPermutationSampler over an empty dataset")
        self._n = n_rows
        self._seed = seed
        self._epoch = None
        self._perm = None

    def batch_indices(self, global_batch: int, batch_size: int) -> np.ndarray:
        per_epoch = max(self._n // batch_size, 1)
        epoch, pos = divmod(int(global_batch), per_epoch)
        if epoch != self._epoch:
            self._perm = np.random.default_rng(
                np.random.SeedSequence([self._seed, epoch])
            ).permutation(self._n)
            self._epoch = epoch
        idx = self._perm[pos * batch_size:(pos + 1) * batch_size]
        if idx.shape[0] < batch_size:
            # degenerate tiny-scene case (n < batch_size): repeat the
            # epoch's permutation deterministically to keep shapes static
            idx = np.resize(self._perm, batch_size)
        return idx
