"""LINEMOD scene loader (6-DoF pose estimation scenes adapted for NeRF).

Parity target: switch_nerf/datasets/nerf_data/load_LINEMOD.py:37-95 —
transforms_{split}.json frames carry absolute file_path + intrinsic_matrix
(focal = K[0][0]; there is NO camera_angle_x in this format), per-split
near/far combined as floor(min)/ceil(max) across train+test, a 40-view
pose_spherical render ring, and half_res downsampling via INTER_AREA that
(like the reference) drops to 3 channels and does NOT rescale K — parity
quirks kept so downstream behavior is identical.
Pinned by tests/test_reference_parity.py::test_linemod_loader_parity.
"""
from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

from switch_nerf_tpu.datasets.nerf_data.load_blender import pose_spherical


def load_LINEMOD_data(basedir, half_res=False, testskip=1):
    splits = ["train", "val", "test"]
    metas = {}
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json")) as fp:
            metas[s] = json.load(fp)

    all_imgs, all_poses, counts = [], [], [0]
    meta = None
    for s in splits:
        meta = metas[s]
        skip = 1 if s == "train" or testskip == 0 else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            # reference reads file_path verbatim (absolute in the real
            # dataset); joining tolerates relative paths too, since
            # os.path.join(base, absolute) returns the absolute path
            fname = os.path.join(basedir, frame["file_path"])
            imgs.append(np.asarray(Image.open(fname)))
            poses.append(np.array(frame["transform_matrix"]))
        all_imgs.append((np.array(imgs) / 255.0).astype(np.float32))
        all_poses.append(np.array(poses).astype(np.float32))
        counts.append(counts[-1] + len(imgs))

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)

    h, w = imgs[0].shape[:2]
    # reference :74-75: focal/K read from the LAST split's first frame
    focal = float(meta["frames"][0]["intrinsic_matrix"][0][0])
    k = meta["frames"][0]["intrinsic_matrix"]

    render_poses = np.stack(
        [pose_spherical(angle, -30.0, 4.0)
         for angle in np.linspace(-180, 180, 40 + 1)[:-1]], 0)

    if half_res:
        import cv2
        h, w = h // 2, w // 2
        focal = focal / 2.0
        # reference :83-88: the resize buffer is 3-channel (alpha dropped)
        # and K is left unscaled — both kept for exact parity
        imgs_half = np.zeros((imgs.shape[0], h, w, 3))
        for i, img in enumerate(imgs):
            imgs_half[i] = cv2.resize(img, (w, h),
                                      interpolation=cv2.INTER_AREA)
        imgs = imgs_half

    near = np.floor(min(metas["train"]["near"], metas["test"]["near"]))
    far = np.ceil(max(metas["train"]["far"], metas["test"]["far"]))
    return imgs, poses, render_poses, [h, w, focal], k, i_split, near, far
