"""NeRFDataset: unified classic-NeRF data container + train/val/test views.

Parity target: switch_nerf/datasets/nerf_data/nerf_loader.py:14-251 —
  * llff: llffhold holdout, NDC rays unless no_ndc, near/far from bounds;
  * blender: white_bkgd alpha compositing, near 2 / far 6;
  * bungee: multiscale Google-Earth scenes, per-ray sphere near/far + radii;
  * optional whole-set downsampling by `scale_factor` (INTER_AREA);
  * precomputed rays [N, H, W, 8] (+ radii), flattened train split,
    per-image val/test splits.

  * LINEMOD / deepvoxels: load_LINEMOD.py / load_deepvoxels.py.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from switch_nerf_tpu.datasets.nerf_data.load_blender import load_blender_data
from switch_nerf_tpu.datasets.nerf_data.load_bungee import (
    get_bungee_nearfar_radii, load_bungee_multiscale_data)
from switch_nerf_tpu.datasets.nerf_data.load_llff import load_llff_data
from switch_nerf_tpu.datasets.nerf_data.ray_utils import get_rays, ndc_rays


class NeRFDataset:
    def __init__(self, args) -> None:
        self.K = None
        self.radii = None
        self.scene_origin = None
        self.scale_split = None
        self.scene_scaling_factor = None

        if args.dataset_type == "llff":
            images, poses, bds, render_poses, i_test = load_llff_data(
                args.datadir, args.factor, recenter=True, bd_factor=0.75,
                spherify=args.spherify)
            hwf = poses[0, :3, -1]
            poses = poses[:, :3, :4]
            if not isinstance(i_test, list):
                i_test = [i_test]
            if args.llffhold > 0:
                i_test = np.arange(images.shape[0])[::args.llffhold]
            i_val = i_test
            i_train = np.array([i for i in np.arange(int(images.shape[0]))
                                if i not in i_test and i not in i_val])
            if args.no_ndc:
                near = float(np.min(bds)) * 0.9
                far = float(np.max(bds)) * 1.0
            else:
                near, far = 0.0, 1.0

        elif args.dataset_type == "blender":
            images, poses, render_poses, hwf, i_split = load_blender_data(
                args.datadir, args.half_res, args.testskip)
            i_train, i_val, i_test = i_split
            near, far = 2.0, 6.0
            if args.white_bkgd:
                images = (images[..., :3] * images[..., -1:]
                          + (1.0 - images[..., -1:]))
            else:
                images = images[..., :3]

        elif args.dataset_type == "LINEMOD":
            from switch_nerf_tpu.datasets.nerf_data.load_LINEMOD import \
                load_LINEMOD_data
            (images, poses, render_poses, hwf, k, i_split, near,
             far) = load_LINEMOD_data(args.datadir, args.half_res,
                                      args.testskip)
            self.K = np.asarray(k, np.float32)
            i_train, i_val, i_test = i_split
            if args.white_bkgd:
                images = (images[..., :3] * images[..., -1:]
                          + (1.0 - images[..., -1:]))
            else:
                images = images[..., :3]

        elif args.dataset_type == "deepvoxels":
            from switch_nerf_tpu.datasets.nerf_data.load_deepvoxels import \
                load_dv_data
            images, poses, render_poses, hwf, i_split = load_dv_data(
                scene=getattr(args, "shape", "cube"), basedir=args.datadir,
                testskip=args.testskip)
            i_train, i_val, i_test = i_split
            hemi_r = float(np.mean(np.linalg.norm(poses[:, :3, -1],
                                                  axis=-1)))
            near, far = hemi_r - 1.0, hemi_r + 1.0
            poses = poses[:, :3, :4]

        elif args.dataset_type == "bungee":
            (images, poses, scene_scaling_factor, scene_origin,
             scale_split) = load_bungee_multiscale_data(args.datadir,
                                                        args.factor)
            self.scene_origin = scene_origin
            self.scale_split = scale_split
            self.scene_scaling_factor = scene_scaling_factor
            i_test = np.arange(images.shape[0])[::args.llffhold]
            i_val = i_test
            i_train = np.array([i for i in np.arange(int(images.shape[0]))
                                if i not in i_test])
            hwf = poses[0, :3, -1]
            poses = poses[:, :3, :4]
            render_poses = poses
            near, far = 0.0, 1.0     # unused: bungee uses per-ray bounds
        else:
            raise NotImplementedError(
                f"dataset type {args.dataset_type!r} not supported")

        self.poses = np.asarray(poses, np.float32)
        self.render_poses = np.asarray(render_poses, np.float32)
        self.i_train, self.i_val, self.i_test = i_train, i_val, i_test
        self.near, self.far = near, far

        h, w, focal = hwf
        h, w = int(h), int(w)
        if self.K is None:
            self.K = np.array([[focal, 0, 0.5 * w],
                               [0, focal, 0.5 * h],
                               [0, 0, 1]], np.float32)
        self.H, self.W = h, w
        self.hwf = [h, w, focal]

        if getattr(args, "scale_factor", 1) > 1:
            import cv2
            sf = args.scale_factor
            assert self.H % sf == 0 and self.W % sf == 0
            self.H, self.W = self.H // sf, self.W // sf
            # Deliberate deviation (documented): the intrinsics AND the
            # NDC focal are both scaled by sf, keeping the FoV constant
            # under downsampling. The reference leaves K unscaled (its
            # scaling lines are commented out, nerf_loader.py:139-141) and
            # feeds the UNSCALED focal to ndc_rays (:158) — mutually
            # inconsistent at sf>1 and unused by every published config
            # (only bungee uses this loader family, with its own
            # near/far path and no NDC).
            self.hwf = [self.H, self.W, focal / sf]
            self.K[:2, :] = self.K[:2, :] / sf
            images = np.stack([
                cv2.resize(img, (self.W, self.H),
                           interpolation=cv2.INTER_AREA) for img in images])

        self.images = np.asarray(images, np.float32)

        rays = []
        for p in self.poses:
            rays_o, rays_d = get_rays(self.H, self.W, self.K, p)
            if not args.no_ndc:
                rays_o, rays_d = ndc_rays(self.H, self.W, self.hwf[2], 1.0,
                                          rays_o, rays_d)
            else:
                rays_d = rays_d / np.linalg.norm(rays_d, axis=-1,
                                                 keepdims=True)
            rays.append(np.concatenate([rays_o, rays_d], -1))
        rays = np.stack(rays, 0)                               # [N, H, W, 6]

        if args.dataset_type == "bungee":
            rays, radii = get_bungee_nearfar_radii(
                rays, scene_scaling_factor=self.scene_scaling_factor,
                scene_origin=self.scene_origin,
                ray_nearfar=args.bungee_ray_nearfar)
            self.radii = radii.astype(np.float32)
        else:
            ones = np.ones_like(rays[..., :1])
            rays = np.concatenate(
                [rays, self.near * ones, self.far * ones], -1)
        self.rays = rays.astype(np.float32)                    # [N, H, W, 8]
        self.rgbs = self.images

        self.rays_train = self.rays[i_train].reshape(-1, 8)
        self.rgbs_train = self.rgbs[i_train].reshape(-1, 3)
        if self.radii is not None:
            self.radii_train = self.radii[i_train].reshape(-1, 1)

        self.rays_val = self.rays[i_val]
        self.rgbs_val = self.rgbs[i_val]
        self.rays_test = self.rays[i_test]
        self.rgbs_test = self.rgbs[i_test]
        if self.radii is not None:
            self.radii_val = self.radii[i_val]
            self.radii_test = self.radii[i_test]
        self.args = args

    @property
    def is_bungee(self):
        return self.args.dataset_type == "bungee"


class NeRFDatasetTrain:
    """Flat per-ray view over the train split."""
    def __init__(self, dataset: NeRFDataset, seed: int = 42):
        self.dataset = dataset
        self._seed = seed
        self._sampler = None

    def __len__(self):
        return self.dataset.rays_train.shape[0]

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        sample = {"rays": self.dataset.rays_train[idx],
                  "rgbs": self.dataset.rgbs_train[idx]}
        if self.dataset.is_bungee:
            sample["radii"] = self.dataset.radii_train[idx]
        return sample

    def get_batch(self, global_batch: int, batch_size: int):
        """Per-epoch permutation batch (reference runner.py:819-827
        DistributedSampler.set_epoch semantics); keyed by the global batch
        counter so resume replays the identical sequence."""
        from switch_nerf_tpu.datasets.dataset_utils import \
            EpochPermutationSampler
        if self._sampler is None:
            self._sampler = EpochPermutationSampler(len(self), self._seed)
        return self[self._sampler.batch_indices(global_batch, batch_size)]


class NeRFDatasetVal:
    """Per-image view over the val split."""
    def __init__(self, dataset: NeRFDataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset.i_val)

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        sample = {"rays": self.dataset.rays_val[idx],
                  "rgbs": self.dataset.rgbs_val[idx],
                  "img_i": self.dataset.i_val[idx]}
        if self.dataset.is_bungee:
            sample["radii"] = self.dataset.radii_val[idx]
        return sample


class NeRFDatasetTest:
    def __init__(self, dataset: NeRFDataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset.i_test)

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        sample = {"rays": self.dataset.rays_test[idx],
                  "rgbs": self.dataset.rgbs_test[idx],
                  "img_i": self.dataset.i_test[idx]}
        if self.dataset.is_bungee:
            sample["radii"] = self.dataset.radii_test[idx]
        return sample
