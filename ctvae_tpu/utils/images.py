"""Image-grid utilities — the torchvision ``vutils.save_image`` analogue
used by the reference's sampling hooks (/root/reference/experiment.py:122-150),
implemented with numpy + PIL (host-side; images leave the device once).

Images are NHWC float in [0, 1] (this framework's convention — the
reference is NCHW in [0, 1]).
"""

from __future__ import annotations

import math
import os

import numpy as np


def make_grid(images: np.ndarray, nrow: int = 12, padding: int = 2,
              pad_value: float = 0.0, normalize: bool = False) -> np.ndarray:
    """Tile [B, H, W, C] into one [H', W', C] grid, ``nrow`` images per row.

    ``normalize=True`` min-max rescales the whole batch to [0, 1]
    (matching ``vutils.save_image(..., normalize=True)``).
    """
    images = np.asarray(images, dtype=np.float32)
    if images.ndim == 3:  # single image
        images = images[None]
    if images.shape[-1] not in (1, 3, 4):  # NCHW slipped in; transpose
        images = np.transpose(images, (0, 2, 3, 1))
    if normalize:
        lo, hi = images.min(), images.max()
        images = (images - lo) / max(hi - lo, 1e-8)
    b, h, w, c = images.shape
    nrow = max(1, min(nrow, b))
    ncol = math.ceil(b / nrow)
    grid = np.full((ncol * (h + padding) + padding,
                    nrow * (w + padding) + padding, c),
                   pad_value, dtype=np.float32)
    for i in range(b):
        r, col = divmod(i, nrow)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = images[i]
    return grid


def save_image(images: np.ndarray, path: str, nrow: int = 12,
               padding: int = 2, normalize: bool = False) -> None:
    """Save a batch as a PNG grid (reference ``vutils.save_image``,
    /root/reference/experiment.py:122-127)."""
    from PIL import Image

    grid = make_grid(images, nrow=nrow, padding=padding, normalize=normalize)
    arr = np.clip(grid * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)


def to_uint8(img: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(img, np.float32) * 255.0 + 0.5,
                   0, 255).astype(np.uint8)
