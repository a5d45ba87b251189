"""ctypes bindings for the native (C++) data-pipeline kernels.

Lazily compiles native/raygen.cc with g++ on first use (cached .so next to
the source, keyed by source mtime); every entry point has a numpy fallback
so the framework works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "raygen.cc"
_SO = _HERE / "libraygen.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[Path]:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", str(_SRC),
           "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("SWITCH_NERF_NO_NATIVE"):
            return None
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if _build() is None:
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None

        f32p = ctypes.POINTER(ctypes.c_float)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i16p = ctypes.POINTER(ctypes.c_int16)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.compute_rays.argtypes = [
            f32p, ctypes.c_int32, ctypes.c_int32, f32p, ctypes.c_int32,
            ctypes.c_float, ctypes.c_float, f32p, f32p]
        lib.gather_rows_f32.argtypes = [f32p, i64p, ctypes.c_int64,
                                        ctypes.c_int64, f32p]
        lib.gather_rows_u8.argtypes = [u8p, i64p, ctypes.c_int64,
                                       ctypes.c_int64, u8p]
        lib.reconstruct_rays.argtypes = [
            f32p, f32p, i64p, i16p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float, f32p, f32p]
        _lib = lib
        return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def compute_rays_native(c2w: np.ndarray, w: int, h: int,
                        intrinsics: np.ndarray, center_pixels: bool,
                        near: float, far: float,
                        altitude_range) -> Optional[np.ndarray]:
    """[H*W, 8] rays, or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    c2w = np.ascontiguousarray(c2w, np.float32)
    intr = np.ascontiguousarray(intrinsics, np.float32)
    out = np.empty((h * w, 8), np.float32)
    alt = (np.ascontiguousarray(altitude_range, np.float32)
           if altitude_range is not None else None)
    lib.compute_rays(_fp(c2w), w, h, _fp(intr), int(center_pixels),
                     float(near), float(far),
                     _fp(alt) if alt is not None else None, _fp(out))
    return out


def gather_rows(src: np.ndarray, perm: np.ndarray) -> np.ndarray:
    """src[perm] with multi-threaded row copies; numpy fallback."""
    lib = get_lib()
    perm = np.ascontiguousarray(perm, np.int64)
    if lib is None or src.ndim != 2 or not src.flags.c_contiguous:
        return src[perm]
    out = np.empty((perm.shape[0], src.shape[1]), src.dtype)
    if src.dtype == np.float32:
        lib.gather_rows_f32(_fp(src),
                            perm.ctypes.data_as(
                                ctypes.POINTER(ctypes.c_int64)),
                            perm.shape[0], src.shape[1], _fp(out))
    elif src.dtype == np.uint8:
        lib.gather_rows_u8(src.ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)),
            perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            perm.shape[0], src.shape[1],
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    else:
        return src[perm]
    return out


def reconstruct_rays_native(directions: np.ndarray, c2ws: np.ndarray,
                            pixel_idx: np.ndarray, image_idx: np.ndarray,
                            near: float, far: float,
                            altitude_range) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    directions = np.ascontiguousarray(directions, np.float32)
    c2ws = np.ascontiguousarray(c2ws, np.float32)
    pixel_idx = np.ascontiguousarray(pixel_idx, np.int64)
    # int16 is the chunk format's index dtype (guarded at write time by
    # dataset_utils INT16_MAX assert); re-check here so a direct caller
    # can't silently wrap into out-of-bounds c2w reads
    if np.asarray(image_idx).size and int(np.max(image_idx)) > 32767:
        raise ValueError("image index exceeds int16 chunk format")
    image_idx = np.ascontiguousarray(image_idx, np.int16)
    n = pixel_idx.shape[0]
    out = np.empty((n, 8), np.float32)
    alt = (np.ascontiguousarray(altitude_range, np.float32)
           if altitude_range is not None else None)
    lib.reconstruct_rays(
        _fp(directions), _fp(c2ws),
        pixel_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        image_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        n, float(near), float(far),
        _fp(alt) if alt is not None else None, _fp(out))
    return out
