"""Minimal binary PLY point-cloud IO (the plyfile package is not available
in this environment; the format needed is just xyz + rgba vertices).

Parity target: the PLY outputs of runner.py:2010-2077 (eval_points) and
scripts/merge_points.py (read -> downsample -> merged write).
"""
from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np

_DTYPE = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                   ("red", "u1"), ("green", "u1"), ("blue", "u1"),
                   ("alpha", "u1")])


def write_ply_points(path, xyz: np.ndarray, rgba: np.ndarray) -> None:
    """xyz [N,3] float; rgba [N,4] uint8 -> binary_little_endian PLY."""
    xyz = np.asarray(xyz, np.float32).reshape(-1, 3)
    rgba = np.asarray(rgba, np.uint8).reshape(-1, 4)
    n = xyz.shape[0]
    header = "\n".join([
        "ply",
        "format binary_little_endian 1.0",
        f"element vertex {n}",
        "property float x",
        "property float y",
        "property float z",
        "property uchar red",
        "property uchar green",
        "property uchar blue",
        "property uchar alpha",
        "end_header",
    ]) + "\n"
    rec = np.empty(n, dtype=_DTYPE)
    rec["x"], rec["y"], rec["z"] = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    rec["red"], rec["green"] = rgba[:, 0], rgba[:, 1]
    rec["blue"], rec["alpha"] = rgba[:, 2], rgba[:, 3]
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rec.tobytes())


def read_ply_points(path) -> Tuple[np.ndarray, np.ndarray]:
    """Read a PLY written by write_ply_points -> (xyz [N,3], rgba [N,4])."""
    data = Path(path).read_bytes()
    end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:end].decode("ascii").splitlines()
    n = next(int(l.split()[-1]) for l in header
             if l.startswith("element vertex"))
    assert "format binary_little_endian 1.0" in header[1], header[1]
    rec = np.frombuffer(data[end:end + n * _DTYPE.itemsize], dtype=_DTYPE)
    xyz = np.stack([rec["x"], rec["y"], rec["z"]], -1).astype(np.float32)
    rgba = np.stack([rec["red"], rec["green"], rec["blue"], rec["alpha"]],
                    -1).astype(np.uint8)
    return xyz, rgba
