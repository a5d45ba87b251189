"""All-in-RAM ray dataset for small scenes.

Parity target: switch_nerf/datasets/memory_dataset.py:12-63. Host-side numpy;
batches are materialised as contiguous arrays ready for a single device_put.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from switch_nerf_tpu.datasets.dataset_utils import (EpochPermutationSampler,
                                                    get_rgb_index_mask)
from switch_nerf_tpu.datasets.image_metadata import ImageMetadata
from switch_nerf_tpu.datasets.ray_utils import compute_image_rays


class MemoryDataset:
    def __init__(self, metadata_items: List[ImageMetadata], near: float,
                 far: float, ray_altitude_range: Optional[Sequence[float]],
                 center_pixels: bool,
                 rng: Optional[np.random.Generator] = None,
                 seed: int = 42):
        # seeded rng (NOT OS entropy): the val-half resampling inside
        # get_rgb_index_mask must be identical on every process (the
        # multi-host design feeds the identical global batch everywhere)
        # and reproducible under --random_seed
        if rng is None:
            rng = np.random.default_rng(seed)
        self._seed = seed
        rgbs, rays, indices = [], [], []
        for item in metadata_items:
            image_data = get_rgb_index_mask(item, rng)
            if image_data is None:
                continue
            image_rgbs, image_indices, keep_mask = image_data
            image_rays = compute_image_rays(
                item.c2w, item.W, item.H, item.intrinsics, center_pixels,
                near, far, ray_altitude_range)
            if keep_mask is not None:
                image_rays = image_rays[keep_mask]
            rgbs.append(image_rgbs.astype(np.float32) / 255.0)
            rays.append(image_rays)
            indices.append(image_indices)

        self._rgbs = np.concatenate(rgbs)
        self._rays = np.concatenate(rays)
        self._image_indices = np.concatenate(indices)
        self._sampler: Optional[EpochPermutationSampler] = None

    def __len__(self) -> int:
        return self._rgbs.shape[0]

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        return {
            "rgbs": self._rgbs[idx],
            "rays": self._rays[idx],
            "image_indices": self._image_indices[idx],
        }

    def get_batch(self, global_batch: int, batch_size: int
                  ) -> Dict[str, np.ndarray]:
        """Per-epoch permutation batch (reference DistributedSampler
        set_epoch semantics, runner.py:819-827); keyed by the global batch
        counter so resume replays the identical sequence."""
        if self._sampler is None:
            self._sampler = EpochPermutationSampler(len(self), self._seed)
        idx = self._sampler.batch_indices(global_batch, batch_size)
        return {
            "rgbs": self._rgbs[idx],
            "rays": self._rays[idx],
            "image_indices": self._image_indices[idx].astype(np.float32),
        }
