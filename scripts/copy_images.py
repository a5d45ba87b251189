"""Reorganize Mega-NeRF raw captures into the dataset layout using
mappings.txt. Parity target: switch_nerf/scripts/copy_images.py (52 LoC).

mappings.txt lines: `<source_image_name>,<train|val>/<rgbs name>`.
"""
import argparse
import shutil
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_path", type=str, required=True,
                   help="directory with the raw captured images")
    p.add_argument("--dataset_path", type=str, required=True,
                   help="Mega-NeRF dataset root (contains mappings.txt)")
    args = p.parse_args()

    dataset_path = Path(args.dataset_path)
    image_path = Path(args.image_path)
    copied = 0
    with open(dataset_path / "mappings.txt") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            src_name, dst_rel = line.split(",")
            dst = dataset_path / dst_rel
            dst.parent.mkdir(parents=True, exist_ok=True)
            shutil.copy(image_path / src_name, dst)
            copied += 1
    print(f"copied {copied} images")


if __name__ == "__main__":
    main()
