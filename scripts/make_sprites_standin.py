#!/usr/bin/env python
"""Materialize a dataset-scale sprites-shaped stand-in on disk.

The disent-library Sprites dataset (pixel-art game characters; 9
factors: bottomwear 7, topwear 7, hair 10, eyes 5, shoes 3, body 4,
action 9, rotation 4, frame 6 — full grid 6.35M frames at 64x64x3)
cannot be downloaded here. The repo's reader
(`ctvae_tpu/data/disent_data.py::load_sprites`) consumes a single
uncompressed ``sprites.npz`` with members ``images`` (uint8
[N,64,64,3]) and ``factors`` (int64 [N,9]); unlike the grid datasets
the factor labels are explicit per-row, so a stratified subset is a
valid instance of the format.

This generator takes every ``--stride``-th row of the full factor grid
(default 10 -> 635,040 images, ~7.8 GB; every factor value and every
character appearance combo is covered), renders a procedural pixel
character per row (appearance factors pick the palette/geometry,
action+frame animate limbs, rotation flips/narrows the facing), and
writes the npz uncompressed so the member-mmap fast path engages.

Idempotent. Usage: python scripts/make_sprites_standin.py [data_root]
"""

from __future__ import annotations

import os
import sys

import numpy as np

SIZES = (7, 7, 10, 5, 3, 4, 9, 4, 6)
IMG = 64

# simple distinct palettes (uint8 RGB rows)
_BOTTOM = np.array([[60, 60, 160], [160, 60, 60], [60, 140, 60],
                    [120, 90, 40], [40, 40, 40], [150, 120, 180],
                    [200, 160, 60]], np.uint8)
_TOP = np.array([[200, 60, 60], [60, 60, 200], [60, 180, 80],
                 [220, 220, 80], [180, 80, 180], [240, 240, 240],
                 [80, 80, 80]], np.uint8)
_HAIR = np.array([[20, 20, 20], [240, 220, 120], [140, 70, 20],
                  [200, 40, 40], [90, 90, 200], [230, 230, 230],
                  [40, 140, 60], [200, 120, 200], [110, 60, 110],
                  [250, 140, 40]], np.uint8)
_EYES = np.array([[40, 40, 200], [40, 160, 40], [120, 70, 30],
                  [30, 30, 30], [170, 70, 170]], np.uint8)
_SHOES = np.array([[30, 30, 30], [140, 90, 40], [220, 220, 220]],
                  np.uint8)
_BODY = np.array([[250, 220, 180], [200, 150, 110], [150, 100, 70],
                  [100, 65, 45]], np.uint8)


def render_batch(fac: np.ndarray) -> np.ndarray:
    """uint8 [B,64,64,3] for a [B,9] block of factor rows (vectorized
    over the batch: every geometric parameter is a [B,1,1] array
    broadcast against the shared 64x64 coordinate grid)."""
    b = len(fac)
    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32) / (IMG - 1)
    yy, xx = yy[None], xx[None]                       # [1,64,64]

    def col(p):                                       # [B,1,1]
        return p.astype(np.float32).reshape(b, 1, 1)

    bot, top, hair, eyes, shoes, body, action, rot, frame = \
        (fac[:, i] for i in range(9))
    phase = 2 * np.pi * frame / 6.0
    amp = 0.04 + 0.035 * (action % 3)                 # swing amplitude
    bob = 0.015 * ((action // 3) % 3) * np.sin(phase) # vertical bob
    swing = amp * np.sin(phase + action * 0.7)
    facing = np.where(rot == 3, -1.0, 1.0)            # right vs left
    width = np.where((rot == 1) | (rot == 3), 0.6, 1.0)  # side view

    cx = 0.5
    head_cy = col(0.30 + bob)
    w = col(width)
    f = col(facing * np.where((rot == 1) | (rot == 3), 1.0, 0.0))
    sw = col(swing)

    img = np.zeros((b, IMG, IMG, 3), np.float32)

    def paint(mask, colors):
        img[mask] = colors.astype(np.float32)[
            np.broadcast_to(np.arange(b)[:, None, None],
                            mask.shape)[mask]]

    # legs (bottomwear), swing opposite phases
    for s in (-1.0, 1.0):
        leg = (np.abs(xx - cx - (0.05 * s * w) - s * sw) < 0.035 * w) \
            & (yy > 0.62) & (yy < 0.88)
        paint(leg, _BOTTOM[bot])
        shoe = (np.abs(xx - cx - (0.05 * s * w) - s * sw) < 0.045 * w) \
            & (yy >= 0.88) & (yy < 0.93)
        paint(shoe, _SHOES[shoes])
    # torso (topwear)
    torso = (np.abs(xx - cx) < 0.11 * w) & (yy > col(0.40 + bob)) \
        & (yy < 0.64)
    paint(torso, _TOP[top])
    # arms (body skin), swing with opposite phase to legs
    for s in (-1.0, 1.0):
        arm = (np.abs(xx - cx - s * (0.14 * w) + s * sw) < 0.028) \
            & (yy > col(0.42 + bob)) & (yy < 0.60)
        paint(arm, _BODY[body])
    # head (body skin)
    head = ((xx - cx - 0.02 * f) / (0.11 * np.maximum(w, 0.7))) ** 2 \
        + ((yy - head_cy) / 0.105) ** 2 <= 1.0
    paint(head, _BODY[body])
    # hair cap (+ style-dependent height)
    hh = col(0.03 + 0.012 * (hair % 3))
    hcap = (((xx - cx - 0.02 * f) / (0.115 * np.maximum(w, 0.7))) ** 2
            + ((yy - head_cy + 0.05) / 0.10) ** 2 <= 1.0) \
        & (yy < head_cy - 0.015 + hh - 0.03)
    paint(hcap, _HAIR[hair])
    # eyes: visible unless facing back (rot==2)
    front = (rot != 2)
    for s in (-1.0, 1.0):
        eye = (np.abs(xx - cx - 0.02 * f - s * 0.035 * w) < 0.012) \
            & (np.abs(yy - head_cy - 0.005) < 0.014) \
            & front[:, None, None]
        paint(eye, _EYES[eyes])
    return img.astype(np.uint8)


def ensure_sprites_standin(data_root: str, stride: int = 10,
                           verbose: bool = True) -> str:
    folder = os.path.join(data_root, "sprites")
    path = os.path.join(folder, "sprites.npz")
    if os.path.exists(path):
        return folder
    os.makedirs(folder, exist_ok=True)
    total = int(np.prod(SIZES))
    idx = np.arange(0, total, stride, dtype=np.int64)
    factors = np.empty((len(idx), 9), np.int64)
    rem = idx.copy()
    for i in range(8, -1, -1):
        factors[:, i] = rem % SIZES[i]
        rem //= SIZES[i]
    images = np.empty((len(idx), IMG, IMG, 3), np.uint8)
    bs = 8192
    for s in range(0, len(idx), bs):
        images[s:s + bs] = render_batch(factors[s:s + bs])
        if verbose and (s // bs) % 10 == 0:
            print(f"  rendered {s + bs}/{len(idx)}")
    np.savez(path, images=images, factors=factors)
    if verbose:
        print(f"wrote {path} ({images.nbytes / 1e9:.1f} GB images)")
    return folder


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "Data/"
    stride = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    ensure_sprites_standin(root, stride)
