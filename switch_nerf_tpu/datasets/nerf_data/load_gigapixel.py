"""Gigapixel image loader (2-D image fitting scenes).

Parity target: switch_nerf/datasets/nerf_data/load_gigapixel.py (16 LoC):
a single large image whose pixels are the supervision targets.
"""
from __future__ import annotations

import numpy as np
from PIL import Image

Image.MAX_IMAGE_PIXELS = None


def load_gigapixel_data(path, scale_factor: float = 1):
    """scale_factor follows the reference convention: a float < 1 scales
    DOWN to floor(scale*H) x floor(scale*W) with a bilinear resize
    (reference: cv2.INTER_LINEAR; here PIL BILINEAR — same kernel up to
    boundary handling, documented deviation since the reference loader is
    unused by any published config); an int > 1 divides the resolution
    (convenience extension)."""
    img = Image.open(path).convert("RGB")
    if 0 < scale_factor < 1:
        import math
        img = img.resize((max(1, math.floor(img.width * scale_factor)),
                          max(1, math.floor(img.height * scale_factor))),
                         Image.BILINEAR)
    elif scale_factor > 1:
        img = img.resize((img.width // int(scale_factor),
                          img.height // int(scale_factor)), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    h, w = arr.shape[:2]
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    coords = np.stack([(xs + 0.5) / w * 2 - 1, (ys + 0.5) / h * 2 - 1], -1)
    return arr, coords.astype(np.float32)
