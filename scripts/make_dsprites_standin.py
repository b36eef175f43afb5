#!/usr/bin/env python
"""Materialize a full-size DSprites-shaped stand-in dataset on disk.

The real DSprites archive (737,280 binary 64x64 sprites over the factor
grid color(1) x shape(3) x scale(6) x orientation(40) x posX(32) x
posY(32)) cannot be downloaded in this zero-egress sandbox, but the
end-to-end input-pipeline benchmark needs a dataset of EXACTLY its scale
and on-disk format (round-2 VERDICT item 1; reference workload:
/root/reference/dataset.py:100-166 feeding
``dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz``).

This renders the complete factor grid procedurally (vectorized numpy:
rotated squares / ellipses / triangles, scaled and translated per the
factor values) into the EXACT file the production loader reads
(``ctvae_tpu/data/disent_data.py::load_dsprites``): an uncompressed
``.npz`` with ``imgs`` uint8 {0,1} [N,64,64] and ``latents_classes``
int64 [N,6] (column 0 = the constant color factor, which the loader
drops, mirroring disent).

Idempotent: call ``ensure_dsprites_standin()`` — it returns immediately
when the file already exists with the right size. ~3 GB on disk.
"""

from __future__ import annotations

import os
import sys

import numpy as np

DSPRITES_FNAME = "dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz"
FACTOR_SIZES = (1, 3, 6, 40, 32, 32)   # color, shape, scale, orient, x, y
IMG = 64


def render_chunk(factors: np.ndarray) -> np.ndarray:
    """Render [N, 6] dsprites factor rows to binary uint8 [N, 64, 64].

    Geometry mirrors real dsprites' ranges: object half-size ~3..10 px
    (scale 0.5..1.0 of a ~20 px object), orientation 0..2pi in 40 steps,
    positions spanning the frame with the object kept inside.
    """
    f = np.asarray(factors)
    n = len(f)
    shape_id = f[:, 1].astype(np.int32)
    half = (3.0 + 7.0 * f[:, 2] / 5.0).astype(np.float32)       # scale
    theta = (2.0 * np.pi * f[:, 3] / 40.0).astype(np.float32)   # orient
    cx = (half + (IMG - 1 - 2 * half) * f[:, 4] / 31.0).astype(np.float32)
    cy = (half + (IMG - 1 - 2 * half) * f[:, 5] / 31.0).astype(np.float32)

    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32)
    dx = xx[None] - cx[:, None, None]
    dy = yy[None] - cy[:, None, None]
    c = np.cos(theta)[:, None, None]
    s = np.sin(theta)[:, None, None]
    u = dx * c + dy * s
    v = -dx * s + dy * c
    h = half[:, None, None]

    square = np.maximum(np.abs(u), np.abs(v)) <= h
    ellipse = (u / h) ** 2 + (v / (0.6 * h)) ** 2 <= 1.0
    triangle = (v >= -h) & (np.abs(u) <= (h - v) * 0.5)
    out = np.where(shape_id[:, None, None] == 0, square,
                   np.where(shape_id[:, None, None] == 1, ellipse,
                            triangle))
    return out.astype(np.uint8)


def ensure_dsprites_standin(data_root: str = "Data/",
                            factor_sizes=FACTOR_SIZES,
                            chunk: int = 16384,
                            verbose: bool = True) -> str:
    """Create ``<data_root>/dsprites/<DSPRITES_FNAME>`` if absent; return
    its path. ``factor_sizes`` can be shrunk for tests (the filename stays
    canonical so the production loader reads it)."""
    folder = os.path.join(data_root, "dsprites")
    path = os.path.join(folder, DSPRITES_FNAME)
    n = int(np.prod(factor_sizes))
    if os.path.exists(path):
        return path
    os.makedirs(folder, exist_ok=True)
    grid = np.indices(factor_sizes).reshape(len(factor_sizes), -1).T
    imgs = np.empty((n, IMG, IMG), np.uint8)
    for lo in range(0, n, chunk):
        imgs[lo:lo + chunk] = render_chunk(grid[lo:lo + chunk])
        if verbose and (lo // chunk) % 8 == 0:
            print(f"  rendered {lo + len(grid[lo:lo + chunk])}/{n}",
                  flush=True)
    tmp = path + ".tmp.npz"
    # uncompressed: load time matters more than the ~3 GB of disk here
    np.savez(tmp.removesuffix(".npz"), imgs=imgs,
             latents_classes=grid.astype(np.int64))
    os.replace(tmp, path)
    if verbose:
        print(f"=> wrote {path} ({os.path.getsize(path) / 1e9:.2f} GB)")
    return path


def ensure_dsprites_transitions(data_root: str = "Data/") -> None:
    """Variation/partition files via the SHIPPED generator (same files
    the reference's utils/disent_variation_gen.py emits)."""
    folder = os.path.join(data_root, "dsprites")
    if (os.path.exists(os.path.join(folder, "list_eval_partition.txt"))
            and os.path.exists(os.path.join(folder,
                                            "variation_attrs_5.txt"))):
        return
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from disent_variation_gen import generate
    generate("dsprites", data_root)


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "Data/"
    ensure_dsprites_standin(root)
    ensure_dsprites_transitions(root)
