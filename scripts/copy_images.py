"""Undistort and reorganize Mega-NeRF raw captures into the dataset layout.

Parity target: switch_nerf/scripts/copy_images.py (52 LoC). mappings.txt
lines are `<source_image_name>,<metadata_name>`; for each line the matching
metadata item is located under train/metadata/ or val/metadata/, the raw
image is UNDISTORTED with the camera matrix built from its 4-vector
intrinsics [fx, fy, cx, cy] and its distortion coefficients, the result is
checked against the metadata H/W, and written to
`<split>/rgbs/<metadata_stem>.<source extension>`.

Deviation: output rgbs/ dirs are created with exist_ok=True (the reference's
bare mkdir() crashes on a rerun over a partially-populated dataset).
"""
import argparse
from pathlib import Path

import numpy as np


def undistort_into_dataset(image_path: Path, dataset_path: Path) -> int:
    import cv2
    import torch

    image_path = Path(image_path)
    dataset_path = Path(dataset_path)
    (dataset_path / "train" / "rgbs").mkdir(parents=True, exist_ok=True)
    (dataset_path / "val" / "rgbs").mkdir(parents=True, exist_ok=True)

    copied = 0
    with (dataset_path / "mappings.txt").open() as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            image_name, metadata_name = line.split(",")
            metadata_path = dataset_path / "train" / "metadata" / \
                metadata_name
            if not metadata_path.exists():
                metadata_path = dataset_path / "val" / "metadata" / \
                    metadata_name
                assert metadata_path.exists(), \
                    f"{metadata_name} in neither train/ nor val/ metadata"

            distorted = cv2.imread(str(image_path / image_name))
            assert distorted is not None, \
                f"unreadable source image {image_path / image_name}"
            metadata = torch.load(metadata_path, map_location="cpu",
                                  weights_only=False)
            intrinsics = metadata["intrinsics"]
            camera_matrix = np.array(
                [[float(intrinsics[0]), 0, float(intrinsics[2])],
                 [0, float(intrinsics[1]), float(intrinsics[3])],
                 [0, 0, 1]])
            distortion = np.asarray(metadata["distortion"])

            undistorted = cv2.undistort(distorted, camera_matrix, distortion)
            assert undistorted.shape[0] == int(metadata["H"])
            assert undistorted.shape[1] == int(metadata["W"])

            ext = image_name.split(".")[-1]
            out = (metadata_path.parent.parent / "rgbs" /
                   f"{metadata_path.stem}.{ext}")
            cv2.imwrite(str(out), undistorted)
            copied += 1
    return copied


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_path", type=str, required=True,
                   help="directory with the raw captured images")
    p.add_argument("--dataset_path", type=str, required=True,
                   help="Mega-NeRF dataset root (contains mappings.txt "
                        "and train|val/metadata/)")
    args = p.parse_args()
    n = undistort_into_dataset(Path(args.image_path),
                               Path(args.dataset_path))
    print(f"undistorted + copied {n} images")


if __name__ == "__main__":
    main()
