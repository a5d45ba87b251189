"""Classic NeRF data loaders (llff / blender / bungee) for the
`train_nerf_moe` path.

Reference: switch_nerf/datasets/nerf_data/ (SURVEY.md §2.4). All-numpy,
all-in-RAM; rays are precomputed per image as [N, H, W, 8] (+ radii for
bungee's mip path).
"""
from switch_nerf_tpu.datasets.nerf_data.nerf_loader import (
    NeRFDataset, NeRFDatasetTrain, NeRFDatasetVal, NeRFDatasetTest)
