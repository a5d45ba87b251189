"""TensorBoard summary writing (scalars + images).

Parity target: the reference's SummaryWriter usage (runner.py:1052,
710-712, 1347-1348). Backed by tf.summary (TensorFlow is a host-side
dependency already used for Block-NeRF tfrecords); degrades to a no-op
when unavailable.
"""
from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


class SummaryWriter:
    def __init__(self, log_dir):
        self._writer = None
        try:
            import tensorflow as tf
        except ImportError:
            # graceful degrade ONLY for a missing TF — that's the one
            # case where silently logging nothing is the intent
            self._tf = None
            return
        tf.config.set_visible_devices([], "GPU")
        self._tf = tf
        try:
            self._writer = tf.summary.create_file_writer(str(log_dir))
        except Exception as e:
            # a bad log_dir/permissions must not pass silently: the whole
            # run would produce zero scalars with no indication
            import logging
            logging.getLogger(__name__).warning(
                "TensorBoard writer creation failed for %s (%s) — "
                "scalar/image logging DISABLED for this run", log_dir, e)

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.scalar(tag, float(value), step=int(step))

    def add_image(self, tag: str, image: np.ndarray, step: int) -> None:
        """image: [H, W, 3] float in [0,1] or uint8."""
        if self._writer is None:
            return
        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        with self._writer.as_default():
            self._tf.summary.image(tag, img[None], step=int(step))

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()
