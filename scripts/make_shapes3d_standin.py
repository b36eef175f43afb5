#!/usr/bin/env python
"""Materialize a full-size 3dshapes-shaped stand-in on disk.

The real 3dshapes archive (480,000 64x64x3 renders over the factor grid
floor_hue(10) x wall_hue(10) x object_hue(10) x scale(8) x shape(4) x
orientation(15), ~5.6 GB) cannot be downloaded in this zero-egress
sandbox, but the `.h5` reader path (round-3 VERDICT weak item 6) needs
a dataset of EXACTLY its scale and on-disk format. This renders the
complete grid procedurally (vectorized numpy: hue-colored floor/wall
planes + a scaled/shaded object whose silhouette tracks the shape
factor and whose x-offset tracks orientation) into the EXACT file
``ctvae_tpu/data/disent_data.py::load_shapes3d`` reads: ``3dshapes.h5``
with ``images`` uint8 [N,64,64,3] and ``labels`` float64 [N,6] carrying
the real dataset's factor VALUES (hues 0..0.9, scale 0.75..1.25, shape
0..3, orientation -30..30) so the loader's unique/searchsorted
value->index conversion does real work.

Idempotent; ~5.9 GB on disk. Usage:
    python scripts/make_shapes3d_standin.py [data_root]
"""

from __future__ import annotations

import os
import sys

import numpy as np

FACTOR_SIZES = (10, 10, 10, 8, 4, 15)
FACTOR_VALUES = (
    np.linspace(0.0, 0.9, 10),        # floor_hue
    np.linspace(0.0, 0.9, 10),        # wall_hue
    np.linspace(0.0, 0.9, 10),        # object_hue
    np.linspace(0.75, 1.25, 8),       # scale
    np.arange(4, dtype=np.float64),   # shape
    np.linspace(-30.0, 30.0, 15),     # orientation
)
IMG = 64


def _hue_rgb(h: np.ndarray) -> np.ndarray:
    """Hue in [0,1) -> RGB in [0,1], smooth cosine colormap. [N] -> [N,3]."""
    ang = 2.0 * np.pi * h[:, None] + np.array([0.0, -2.094, -4.188])
    return 0.55 + 0.45 * np.cos(ang)


def render_chunk(factors: np.ndarray) -> np.ndarray:
    """Render [N, 6] factor-INDEX rows to uint8 [N, 64, 64, 3]."""
    f = np.asarray(factors)
    n = len(f)
    floor_rgb = _hue_rgb(FACTOR_VALUES[0][f[:, 0]])
    wall_rgb = _hue_rgb(FACTOR_VALUES[1][f[:, 1]])
    obj_rgb = _hue_rgb(FACTOR_VALUES[2][f[:, 2]])
    scale = FACTOR_VALUES[3][f[:, 3]].astype(np.float32)
    shape_id = f[:, 4].astype(np.int32)
    orient = FACTOR_VALUES[5][f[:, 5]].astype(np.float32)

    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32) / (IMG - 1)
    img = np.empty((n, IMG, IMG, 3), np.float32)
    # wall above the horizon, floor below, both shaded by height
    horizon = 0.62
    is_floor = (yy >= horizon)[None, :, :, None]
    shade = (0.75 + 0.25 * yy)[None, :, :, None]
    img[:] = np.where(is_floor, floor_rgb[:, None, None, :],
                      wall_rgb[:, None, None, :]) * shade

    # object: center tracks orientation (the real renders orbit the
    # camera), radius tracks scale, silhouette tracks shape
    cx = 0.5 + 0.25 * np.sin(np.deg2rad(orient))
    cy = horizon - 0.18 * scale
    r = (0.11 + 0.10 * (scale - 0.75))[:, None, None]
    dx = xx[None] - cx[:, None, None]
    dy = yy[None] - cy[:, None, None]
    sph = dx * dx + dy * dy <= r * r
    cube = np.maximum(np.abs(dx), np.abs(dy)) <= 0.9 * r
    cyl = (np.abs(dx) <= 0.8 * r) & (np.abs(dy) <= 1.15 * r)
    capsule = (dx * dx + (0.6 * dy) ** 2) <= r * r
    obj = np.where(shape_id[:, None, None] == 0, sph,
                   np.where(shape_id[:, None, None] == 1, cube,
                            np.where(shape_id[:, None, None] == 2, cyl,
                                     capsule)))
    glow = np.clip(1.0 - (dx * dx + dy * dy) / np.maximum(r * r, 1e-6),
                   0.25, 1.0)
    obj_col = obj_rgb[:, None, None, :] * glow[..., None]
    img = np.where(obj[..., None], obj_col, img)
    return np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)


def ensure_shapes3d_standin(data_root: str = "Data/",
                            factor_sizes=FACTOR_SIZES,
                            chunk: int = 8192,
                            verbose: bool = True) -> str:
    """Create ``<data_root>/3dshapes/3dshapes.h5`` if absent (full size
    by default; shrink ``factor_sizes`` for tests — the filename stays
    canonical so the production loader reads it)."""
    import h5py
    folder = os.path.join(data_root, "3dshapes")
    path = os.path.join(folder, "3dshapes.h5")
    n = int(np.prod(factor_sizes))
    if os.path.exists(path):
        return path
    os.makedirs(folder, exist_ok=True)
    grid = np.indices(factor_sizes).reshape(len(factor_sizes), -1).T
    labels = np.stack([np.asarray(FACTOR_VALUES[i])[:s][grid[:, i]]
                       for i, s in enumerate(factor_sizes)], axis=1)
    tmp = path + ".tmp.h5"
    with h5py.File(tmp, "w") as f:
        # 256-row chunks (~3 MB): row gathers stay cheap, no compression
        # (read throughput matters more than the 5.9 GB of disk)
        d = f.create_dataset("images", shape=(n, IMG, IMG, 3),
                             dtype=np.uint8,
                             chunks=(min(256, n), IMG, IMG, 3))
        f.create_dataset("labels", data=labels.astype(np.float64))
        for lo in range(0, n, chunk):
            d[lo:lo + chunk] = render_chunk(grid[lo:lo + chunk])
            if verbose and (lo // chunk) % 8 == 0:
                print(f"  rendered {min(lo + chunk, n)}/{n}", flush=True)
    os.replace(tmp, path)
    if verbose:
        print(f"=> wrote {path} ({os.path.getsize(path) / 1e9:.2f} GB)")
    return path


def ensure_shapes3d_transitions(data_root: str = "Data/") -> None:
    """Split + variation files via the shipped generator (same artifacts
    the reference's utils/disent_variation_gen.py emits)."""
    folder = os.path.join(data_root, "3dshapes")
    if (os.path.exists(os.path.join(folder, "list_eval_partition.txt"))
            and os.path.exists(os.path.join(folder,
                                            "variation_attrs_6.txt"))):
        return
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from disent_variation_gen import generate
    generate("3dshapes", data_root)


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "Data/"
    ensure_shapes3d_standin(root)
    ensure_shapes3d_transitions(root)
