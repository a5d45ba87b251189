"""Data pipeline: Mega-NeRF chunked filesystem dataset, in-memory dataset,
Block-NeRF tfrecord ingestion, and classic-NeRF loaders.

Host-side (numpy/threads) by design: ray generation and chunk shuffling are
IO/bandwidth work that should overlap training, not occupy the TPU. Batches
cross to device once per step as a single [B, 8]+[B, 3] transfer.

Reference: switch_nerf/datasets/ (SURVEY.md §2.4).
"""
from switch_nerf_tpu.datasets.ray_utils import (
    get_ray_directions, get_rays, get_rays_batch)
from switch_nerf_tpu.datasets.image_metadata import ImageMetadata
from switch_nerf_tpu.datasets.dataset_utils import get_rgb_index_mask
from switch_nerf_tpu.datasets.memory_dataset import MemoryDataset
from switch_nerf_tpu.datasets.filesystem_dataset import FilesystemDataset
