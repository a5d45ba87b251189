"""Blender-synthetic scene loader (lego etc.).

Parity target: switch_nerf/datasets/nerf_data/load_blender.py — standard
transforms_{split}.json format; 40-frame render path on a 4-unit circle;
half_res downsampling; rgba float images in [0, 1].
"""
from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image


def _trans_t(t):
    return np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, t], [0, 0, 0, 1]],
                    np.float32)


def _rot_phi(phi):
    return np.array([[1, 0, 0, 0],
                     [0, np.cos(phi), -np.sin(phi), 0],
                     [0, np.sin(phi), np.cos(phi), 0],
                     [0, 0, 0, 1]], np.float32)


def _rot_theta(th):
    return np.array([[np.cos(th), 0, -np.sin(th), 0],
                     [0, 1, 0, 0],
                     [np.sin(th), 0, np.cos(th), 0],
                     [0, 0, 0, 1]], np.float32)


def pose_spherical(theta, phi, radius):
    c2w = _trans_t(radius)
    c2w = _rot_phi(phi / 180.0 * np.pi) @ c2w
    c2w = _rot_theta(theta / 180.0 * np.pi) @ c2w
    c2w = np.array([[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]],
                   np.float32) @ c2w
    return c2w


def load_blender_data(basedir, half_res=False, testskip=1):
    splits = ["train", "val", "test"]
    metas = {}
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json")) as fp:
            metas[s] = json.load(fp)

    all_imgs, all_poses, counts = [], [], [0]
    for s in splits:
        meta = metas[s]
        skip = 1 if s == "train" or testskip == 0 else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            fname = os.path.join(basedir, frame["file_path"] + ".png")
            imgs.append(np.asarray(Image.open(fname).convert("RGBA"),
                                   np.float32) / 255.0)
            poses.append(np.array(frame["transform_matrix"], np.float32))
        all_imgs.append(np.stack(imgs))
        all_poses.append(np.stack(poses))
        counts.append(counts[-1] + len(imgs))

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)

    h, w = imgs[0].shape[:2]
    camera_angle_x = float(metas["train"]["camera_angle_x"])
    focal = 0.5 * w / np.tan(0.5 * camera_angle_x)

    render_poses = np.stack([pose_spherical(angle, -30.0, 4.0)
                             for angle in np.linspace(-180, 180, 41)[:-1]])

    if half_res:
        # float INTER_AREA like the reference (load_blender.py:82-84) —
        # a uint8 round-trip would lose sub-1/255 precision in rgb+alpha
        import cv2
        h, w = h // 2, w // 2
        focal = focal / 2.0
        imgs_half = np.zeros((imgs.shape[0], h, w, 4), np.float32)
        for i, img in enumerate(imgs):
            imgs_half[i] = cv2.resize(img, (w, h),
                                      interpolation=cv2.INTER_AREA)
        imgs = imgs_half

    return imgs, poses, render_poses, [h, w, focal], i_split
