"""Synthetic in-memory dataset for tests and benchmarks.

The reference tests feed ``torch.randn`` batches (SURVEY.md §4); this is
the structured equivalent: a deterministic procedurally-generated 64x64
image set (colored rectangles over gradients) with factor labels, so
shape/loss smoke tests, the transition pipeline, and disentanglement
metrics all have something real to chew on without downloads.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def make_synthetic_images(n: int, img_size: int = 64, channels: int = 3,
                          seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (images [n,H,W,C] float32 in [0,1], factors [n,4] int)."""
    rng = np.random.default_rng(seed)
    # factors: x-pos (8), y-pos (8), scale (4), hue (6)
    fx = rng.integers(0, 8, n)
    fy = rng.integers(0, 8, n)
    fs = rng.integers(0, 4, n)
    fh = rng.integers(0, 6, n)
    imgs = np.zeros((n, img_size, img_size, channels), np.float32)
    yy, xx = np.mgrid[0:img_size, 0:img_size].astype(np.float32) / img_size
    for i in range(n):
        base = 0.25 + 0.5 * (xx * ((fh[i] % 3) + 1) / 3.0)
        img = np.stack([base * (0.5 + 0.5 * (c == fh[i] % channels))
                        for c in range(channels)], axis=-1)
        cx = int((fx[i] + 0.5) * img_size / 8)
        cy = int((fy[i] + 0.5) * img_size / 8)
        half = 3 + 2 * int(fs[i])
        x0, x1 = max(0, cx - half), min(img_size, cx + half)
        y0, y1 = max(0, cy - half), min(img_size, cy + half)
        img[y0:y1, x0:x1, :] = (fh[i] + 1) / 6.0
        imgs[i] = img
    factors = np.stack([fx, fy, fs, fh], axis=1).astype(np.int64)
    return imgs, factors


class SyntheticDataset:
    """Array-backed dataset with the adapter surface the transition wrapper
    expects (``split`` / ``root`` / ``base_folder`` / ``indices``, cf.
    /root/reference/datasets/transition.py:29-49)."""

    def __init__(self, n: int = 256, img_size: int = 64, channels: int = 3,
                 split: str = "train", seed: int = 0):
        all_imgs, all_factors = make_synthetic_images(n, img_size, channels, seed)
        cut = int(n * 0.8)
        if split == "train":
            sl = slice(0, cut)
        else:
            sl = slice(cut, n)
        self.images = all_imgs[sl]
        self.factors = all_factors[sl]
        self.split = split
        self.root = ""
        self.base_folder = ""
        self.indices = [str(i) for i in range(len(self.images))]
        self.factor_sizes = (8, 8, 4, 6)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx: int):
        return self.images[idx], self.factors[idx]
