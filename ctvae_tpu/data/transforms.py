"""Host-side image transforms (numpy/PIL), NHWC float32 in [0, 1].

The reference pipeline is ToTensor -> CenterCrop(148) -> Resize(patch)
for every dataset (/root/reference/dataset.py:72-80). Note torchvision's
CenterCrop *pads with zeros* when the crop is larger than the image (e.g.
64x64 DSprites cropped to 148) — reproduced here exactly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
from PIL import Image


def to_float(img: np.ndarray) -> np.ndarray:
    """uint8 [0,255] or float -> float32 [0,1], HWC (adds channel dim for
    grayscale)."""
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    else:
        img = img.astype(np.float32)
    if img.ndim == 2:
        img = img[:, :, None]
    return img


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    """torchvision-compatible center crop: crops when larger, zero-pads
    when smaller."""
    h, w, c = img.shape
    if h < size or w < size:
        out = np.zeros((max(h, size), max(w, size), c), img.dtype)
        top = (out.shape[0] - h) // 2
        left = (out.shape[1] - w) // 2
        out[top:top + h, left:left + w] = img
        img = out
        h, w = img.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return img[top:top + size, left:left + size]


def resize(img: np.ndarray, size: Union[int, Sequence[int]]) -> np.ndarray:
    """Bilinear resize via PIL (matches torchvision Resize defaults)."""
    if isinstance(size, int):
        size = (size, size)
    h, w = size
    if img.shape[0] == h and img.shape[1] == w:
        return img
    chans = []
    for c in range(img.shape[2]):
        pil = Image.fromarray((img[:, :, c] * 255).astype(np.uint8))
        chans.append(np.asarray(pil.resize((w, h), Image.BILINEAR),
                                np.float32) / 255.0)
    return np.stack(chans, axis=-1)


class StandardTransform:
    """ToTensor -> CenterCrop(crop) -> Resize(patch_size), vectorizable
    over a batch."""

    def __init__(self, patch_size: Union[int, Sequence[int]] = 64,
                 crop: Optional[int] = 148):
        self.patch_size = patch_size
        self.crop = crop

    def __call__(self, img: np.ndarray) -> np.ndarray:
        img = to_float(img)
        if self.crop:
            img = center_crop(img, self.crop)
        return resize(img, self.patch_size)

    def batch(self, imgs: np.ndarray) -> np.ndarray:
        """Batched transform; uses the threaded C++ kernel when built
        (ctvae_tpu/native), identical output to the per-image path."""
        from .. import native
        if native.available() and imgs.ndim in (3, 4):
            return native.crop_resize_batch(imgs, self.crop,
                                            self.patch_size)
        return np.stack([self(im) for im in imgs])
