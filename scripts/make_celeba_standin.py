#!/usr/bin/env python
"""Materialize a full-size CelebA-shaped stand-in on disk.

The real CelebA archive cannot be downloaded here (zero egress), but
the JPEG input-pipeline benchmark needs a dataset of its exact scale
and on-disk layout (202,599 aligned 178x218 JPEGs + partition file —
the torchvision layout ``MyCelebA`` reads,
/root/reference/datasets/celeba_dataset.py). Renders procedural
face-ish images (gradient background + skin-tone ellipse + eyes) and
encodes real JPEGs, so the decode path does representative work.

Idempotent: skips files that already exist (cheap resume). ~2 GB, ~15
min single-core for the full set; pass a count to generate fewer.

Usage: python scripts/make_celeba_standin.py [data_root] [count]
"""

from __future__ import annotations

import os
import sys

import numpy as np

N_IMAGES = 202_599
W, H = 178, 218
# torchvision CelebA split boundaries (list_eval_partition.txt):
# 1-162770 train, 162771-182637 valid, 182638-202599 test
TRAIN_END, VALID_END = 162_770, 182_637


def render(idx: int, rng: np.random.Generator) -> np.ndarray:
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    bg = rng.uniform(0.1, 0.9, 3).astype(np.float32)
    img = (bg[None, None] * (0.6 + 0.4 * (yy / H)[..., None]))
    cx, cy = rng.uniform(60, 118), rng.uniform(80, 140)
    a, b = rng.uniform(38, 55), rng.uniform(50, 72)
    face = ((xx - cx) / a) ** 2 + ((yy - cy) / b) ** 2 <= 1.0
    tone = np.array([0.85, 0.65, 0.5], np.float32) * rng.uniform(0.6, 1.1)
    img[face] = tone
    for dx in (-0.35, 0.35):
        ex, ey = cx + dx * a, cy - 0.25 * b
        eye = ((xx - ex) / 6) ** 2 + ((yy - ey) / 4) ** 2 <= 1.0
        img[eye] = 0.08
    noise = rng.normal(0, 0.02, img.shape).astype(np.float32)
    return np.clip((img + noise) * 255.0, 0, 255).astype(np.uint8)


def ensure_celeba_standin(data_root: str = "Data/",
                          count: int = N_IMAGES,
                          verbose: bool = True) -> str:
    from PIL import Image
    folder = os.path.join(data_root, "celeba")
    img_dir = os.path.join(folder, "img_align_celeba")
    os.makedirs(img_dir, exist_ok=True)

    part_file = os.path.join(folder, "list_eval_partition.txt")
    if not os.path.exists(part_file):
        with open(part_file, "w") as f:
            for i in range(1, count + 1):
                split = 0 if i <= TRAIN_END else (1 if i <= VALID_END
                                                  else 2)
                f.write(f"{i:06d}.jpg {split}\n")

    made = 0
    for i in range(1, count + 1):
        path = os.path.join(img_dir, f"{i:06d}.jpg")
        if os.path.exists(path):
            continue
        # per-image seed: image i's pixels depend only on i, never on
        # how many images a previous (interrupted) run already wrote —
        # fresh and resumed runs render byte-identical JPEGs
        Image.fromarray(render(i, np.random.default_rng(i))).save(
            path, quality=80)
        made += 1
        if verbose and made % 20000 == 0:
            print(f"  wrote {made} jpegs (at {i}/{count})", flush=True)
    if verbose:
        print(f"=> {img_dir}: {count} images ready ({made} new)")
    return folder


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "Data/"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else N_IMAGES
    ensure_celeba_standin(root, n)
