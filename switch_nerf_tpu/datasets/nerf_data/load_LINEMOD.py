"""LINEMOD scene loader (6-DoF pose estimation scenes adapted for NeRF).

Parity target: switch_nerf/datasets/nerf_data/load_LINEMOD.py —
transforms_{split}.json with per-frame near/far + camera_angle_x, intrinsic
K, optional half-res downsampling.
"""
from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image


def load_LINEMOD_data(basedir, half_res=False, testskip=1):
    splits = ["train", "val", "test"]
    metas = {}
    for s in splits:
        with open(os.path.join(basedir, f"transforms_{s}.json")) as fp:
            metas[s] = json.load(fp)

    all_imgs, all_poses, counts = [], [], [0]
    # reference load_LINEMOD.py:91-92: bounds span BOTH splits, floored/
    # ceiled (per-split raw values would clip geometry the reference keeps)
    near = float(np.floor(min(metas["train"]["near"], metas["test"]["near"])))
    far = float(np.ceil(max(metas["train"]["far"], metas["test"]["far"])))
    k = None
    for s in splits:
        meta = metas[s]
        skip = 1 if s == "train" or testskip == 0 else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            fname = os.path.join(basedir, frame["file_path"])
            imgs.append(np.asarray(Image.open(fname).convert("RGBA"),
                                   np.float32) / 255.0)
            poses.append(np.array(frame["transform_matrix"], np.float32))
        km = meta["frames"][0].get("intrinsic_matrix") \
            if meta.get("frames") else None
        if km is not None:
            k = np.array(km, np.float32)
        all_imgs.append(np.stack(imgs))
        all_poses.append(np.stack(poses))
        counts.append(counts[-1] + len(imgs))

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)

    h, w = imgs[0].shape[:2]
    camera_angle_x = float(metas["train"]["camera_angle_x"])
    focal = 0.5 * w / np.tan(0.5 * camera_angle_x)
    if k is None:
        k = np.array([[focal, 0, 0.5 * w],
                      [0, focal, 0.5 * h],
                      [0, 0, 1]], np.float32)

    render_poses = poses[i_split[2]]

    if half_res:
        h, w = h // 2, w // 2
        focal = focal / 2.0
        k = k.copy()
        k[:2, :] = k[:2, :] / 2.0
        imgs_half = np.zeros((imgs.shape[0], h, w, 4), np.float32)
        for i, img in enumerate(imgs):
            pil = Image.fromarray((img * 255).astype(np.uint8))
            imgs_half[i] = np.asarray(pil.resize((w, h), Image.LANCZOS),
                                      np.float32) / 255.0
        imgs = imgs_half

    return imgs, poses, render_poses, [h, w, focal], np.asarray(k), \
        i_split, near, far
