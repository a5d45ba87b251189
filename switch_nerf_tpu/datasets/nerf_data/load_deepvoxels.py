"""DeepVoxels scene loader.

Parity target: switch_nerf/datasets/nerf_data/load_deepvoxels.py — pose .txt
files (4x4 row-major), intrinsics.txt (focal + origin line), 512x512 images,
train/validation/test splits with testskip.
"""
from __future__ import annotations

import os

import numpy as np
from PIL import Image


def load_pose(path) -> np.ndarray:
    return np.loadtxt(path, dtype=np.float32).reshape(4, 4)


def load_dv_data(scene="cube", basedir="/data/deepvoxels", testskip=8):
    def parse_intrinsics(filepath, target_side_len, invert_y=False):
        with open(filepath) as f:
            f_, cx, cy = list(map(float, f.readline().split()))[:3]
            grid_barycenter = np.array(
                list(map(float, f.readline().split())), np.float32)
            near_plane = float(f.readline())
            scale = float(f.readline())
            height, width = map(float, f.readline().split())
            try:
                world2cam_poses = bool(int(f.readline()))
            except ValueError:      # 7th line absent/blank
                world2cam_poses = False
        cx = cx / width * target_side_len
        cy = cy / height * target_side_len
        f_ = target_side_len / height * f_
        fy = -f_ if invert_y else f_
        full_intrinsic = np.array([[f_, 0, cx, 0],
                                   [0, fy, cy, 0],
                                   [0, 0, 1, 0],
                                   [0, 0, 0, 1]], np.float32)
        return full_intrinsic, grid_barycenter, scale, near_plane, \
            world2cam_poses

    def dir_files(d, ext):
        return [os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(ext)]

    # reference dir2poses (load_deepvoxels.py:65-75): DeepVoxels poses are
    # OpenCV-convention; flip y/z into the OpenGL convention NeRF uses,
    # and return [N, 3, 4]
    transf = np.array([[1, 0, 0, 0], [0, -1, 0, 0],
                       [0, 0, -1, 0], [0, 0, 0, 1.0]], np.float32)

    h = w = 512
    deepvoxels_base = os.path.join(basedir, "train", scene)
    full_intrinsic, *_ = parse_intrinsics(
        os.path.join(deepvoxels_base, "intrinsics.txt"), h)
    focal = full_intrinsic[0, 0]

    all_imgs, all_poses, counts = [], [], [0]
    for split, skip in (("train", 1), ("validation", testskip),
                        ("test", testskip)):
        base = os.path.join(basedir, split, scene)
        imgfiles = dir_files(os.path.join(base, "rgb"), "png")[::skip]
        posefiles = dir_files(os.path.join(base, "pose"), "txt")[::skip]
        imgs = np.stack([np.asarray(Image.open(f).convert("RGB"),
                                    np.float32) / 255.0 for f in imgfiles])
        poses = np.stack([load_pose(f) for f in posefiles])
        poses = (poses @ transf)[:, :3, :4]
        all_imgs.append(imgs)
        all_poses.append(poses.astype(np.float32))
        counts.append(counts[-1] + imgs.shape[0])

    i_split = [np.arange(counts[i], counts[i + 1]) for i in range(3)]
    imgs = np.concatenate(all_imgs, 0)
    poses = np.concatenate(all_poses, 0)
    render_poses = all_poses[2]
    return imgs, poses, render_poses, [h, w, focal], i_split
