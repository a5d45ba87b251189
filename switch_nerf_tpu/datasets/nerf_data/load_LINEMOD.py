"""LINEMOD scene loader (6-DoF pose estimation scenes adapted for NeRF).

Parity target: switch_nerf/datasets/nerf_data/load_LINEMOD.py:37-95 —
transforms_{split}.json frames carry absolute file_path + intrinsic_matrix
(focal = K[0][0]; there is NO camera_angle_x in this format), per-split
near/far combined as floor(min)/ceil(max) across train+test, a 40-view
pose_spherical render ring, and half_res downsampling via INTER_AREA.
Two documented half_res deviations (the reference's own half_res crashes
on the real RGBA data and leaves K stale — see inline comments): the
resize keeps the source channel count and K is rescaled with focal.
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
            img = Image.open(fname)
            if img.mode == "P":
                # imageio (the reference's decoder) expands palette PNGs;
                # bare PIL would yield 2-D index arrays
                img = img.convert(
                    "RGBA" if "transparency" in img.info else "RGB")
            imgs.append(np.asarray(img))
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
        # DOCUMENTED DEVIATIONS from reference :83-88 (both of which make
        # its half_res unusable on the real RGBA dataset):
        #   * the reference's resize buffer is hardcoded 3-channel and
        #     CRASHES on RGBA input — we keep the source channel count;
        #   * the reference halves focal but leaves K stale, so
        #     downstream get_rays(H/2, W/2, K, ...) points every ray at
        #     the wrong scene region — we rescale K consistently (the
        #     same policy as the scale_factor intrinsics fix in
        #     nerf_loader.py).
        k = np.array(k, np.float64)
        k[:2, :] = k[:2, :] / 2.0
        imgs_half = np.zeros((imgs.shape[0], h, w, imgs.shape[-1]))
        for i, img in enumerate(imgs):
            imgs_half[i] = cv2.resize(img, (w, h),
                                      interpolation=cv2.INTER_AREA
                                      ).reshape(h, w, imgs.shape[-1])
        imgs = imgs_half

    near = np.floor(min(metas["train"]["near"], metas["test"]["near"]))
    far = np.ceil(max(metas["train"]["far"], metas["test"]["far"]))
    return imgs, poses, render_poses, [h, w, focal], k, i_split, near, far
