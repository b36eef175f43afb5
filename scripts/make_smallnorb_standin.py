#!/usr/bin/env python
"""Materialize a full-size smallNORB-shaped stand-in on disk.

The real smallNORB training chunk (24,300 stereo pairs at 96x96, LeCun's
custom binary-matrix container) cannot be downloaded here, but the
binary reader path (`ctvae_tpu/data/disent_data.py::_read_norb_matrix`
/ `load_smallnorb`, round-4 VERDICT missing item 1) needs the exact
on-disk layout:

  smallnorb-5x46789x9x18x6x2x96x96-training-dat.mat   uint8 [24300,2,96,96]
  smallnorb-5x46789x9x18x6x2x96x96-training-cat.mat   int32 [24300]
  smallnorb-5x46789x9x18x6x2x96x96-training-info.mat  int32 [24300,4]

including the real format's quirks: the magic/ndim/dims header always
stores >=3 dims, training instances are {4,6,7,8,9} (not 0..4), azimuth
is stored as EVEN values 0..34 (18 steps of 2), and rows arrive
unsorted (the loader lexsorts into grid order). ~450 MB total.

Renders a procedural toy per (category, instance): 5 categories with
distinct silhouettes (animal / human / airplane / truck / car),
elevation squashes + raises the camera, azimuth rotates the footprint,
lighting scales brightness, and the second camera is a small horizontal
parallax shift.

Idempotent. Usage: python scripts/make_smallnorb_standin.py [data_root]
"""

from __future__ import annotations

import os
import sys

import numpy as np

IMG = 96
PREFIX = "smallnorb-5x46789x9x18x6x2x96x96-training"
MAGIC = {np.dtype(np.uint8): 0x1E3D4C55, np.dtype(np.int32): 0x1E3D4C54}


def write_norb_matrix(path: str, arr: np.ndarray) -> None:
    """Write LeCun's binary-matrix container (little-endian header:
    magic, ndim, then max(ndim, 3) dims — trailing dims padded with 1)."""
    arr = np.ascontiguousarray(arr)
    with open(path, "wb") as f:
        f.write(int(MAGIC[arr.dtype]).to_bytes(4, "little"))
        f.write(int(arr.ndim).to_bytes(4, "little"))
        dims = list(arr.shape) + [1] * max(0, 3 - arr.ndim)
        for d in dims:
            f.write(int(d).to_bytes(4, "little"))
        f.write(arr.tobytes())


def render_views(cat: int, inst: int, elevs: np.ndarray,
                 azims: np.ndarray, lights: np.ndarray) -> np.ndarray:
    """uint8 [n_views, 2, 96, 96] for one toy over the given factor
    rows (one row per view: elevation idx, azimuth raw, lighting)."""
    rng = np.random.default_rng(cat * 100 + inst)
    base_h = rng.uniform(0.18, 0.30)
    base_w = rng.uniform(0.25, 0.40)
    gray = rng.uniform(0.35, 0.75)
    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32) / (IMG - 1)
    out = np.empty((len(elevs), 2, IMG, IMG), np.uint8)
    for i, (el, az_raw, li) in enumerate(zip(elevs, azims, lights)):
        a = az_raw / 34.0 * 2 * np.pi
        ca, sa = np.cos(a), np.sin(a)
        half_w = base_w * abs(ca) + 0.55 * base_w * abs(sa)
        squash = 1.0 - 0.45 * (el / 8.0)     # 30..70 deg camera
        cy = 0.58 - 0.06 * (el / 8.0)
        bright = 0.45 + 0.11 * li
        for cam in range(2):
            cx = 0.5 + (0.025 if cam else -0.025) * ca
            img = np.full((IMG, IMG), 0.18 + 0.10 * yy, np.float32)
            dx = (xx - cx) / max(half_w, 1e-3)
            dy = (yy - cy) / (base_h * squash)
            if cat == 0:      # four-legged animal: body + head + legs
                body = dx * dx + dy * dy <= 1.0
                head = ((xx - cx - 0.8 * half_w * ca) ** 2
                        + (yy - cy + 1.1 * base_h * squash) ** 2
                        <= (0.35 * base_w) ** 2)
                legs = (np.abs(dx) <= 0.9) & (dy > 0.6) & (dy <= 1.8) \
                    & (np.abs((np.abs(dx * 2.2) % 1.0) - 0.5) < 0.22)
                mask = body | head | legs
            elif cat == 1:    # human figure: torso + head
                torso = (np.abs(dx) <= 0.45) & (np.abs(dy) <= 1.4)
                head = (dx * dx + ((dy + 1.9) * 1.2) ** 2) <= 0.16
                mask = torso | head
            elif cat == 2:    # airplane: fuselage + swept wings
                fus = (np.abs(dx) <= 1.0) & (np.abs(dy) <= 0.28)
                wings = (np.abs(dy + 0.9 * dx * sa) <= 0.18) \
                    & (np.abs(dx) <= 0.9) & (np.abs(dy) <= 1.0)
                mask = fus | wings
            elif cat == 3:    # truck: tall box + cab
                box = (np.abs(dx) <= 1.0) & (np.abs(dy) <= 1.1)
                cab = (dx > 0.55) & (np.abs(dx) <= 1.0) & (dy > -1.7) \
                    & (dy <= -1.1)
                mask = box | cab
            else:             # car: low slab + cabin bump
                slab = (np.abs(dx) <= 1.0) & (np.abs(dy) <= 0.6)
                cabin = (np.abs(dx) <= 0.5) & (dy > -1.2) & (dy <= -0.6)
                mask = slab | cabin
            shade = gray * bright * (0.75 + 0.25 * ca * ca)
            img[mask] = shade + 0.08 * dy[mask] * bright
            img += rng.normal(0.0, 0.004, img.shape).astype(np.float32)
            out[i, cam] = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    return out


def ensure_smallnorb_standin(data_root: str, verbose: bool = True) -> str:
    folder = os.path.join(data_root, "smallnorb")
    dat_p = os.path.join(folder, PREFIX + "-dat.mat")
    if os.path.exists(dat_p):
        return folder
    os.makedirs(folder, exist_ok=True)
    instances = np.array([4, 6, 7, 8, 9], np.int32)   # training split
    elev_idx = np.arange(9, dtype=np.int32)           # 0..8
    azim_raw = np.arange(0, 36, 2, dtype=np.int32)    # even 0..34
    light = np.arange(6, dtype=np.int32)

    grid = np.stack(np.meshgrid(np.arange(5, dtype=np.int32), instances,
                                elev_idx, azim_raw, light,
                                indexing="ij"), -1).reshape(-1, 5)
    n = len(grid)
    dat = np.empty((n, 2, IMG, IMG), np.uint8)
    per = 9 * 18 * 6
    for ci in range(5):
        for ii in range(5):
            s = (ci * 5 + ii) * per
            rows = grid[s:s + per]
            dat[s:s + per] = render_views(ci, int(instances[ii]),
                                          rows[:, 2], rows[:, 3],
                                          rows[:, 4])
            if verbose:
                print(f"  rendered cat={ci} inst={instances[ii]}")
    # real files are NOT grid-sorted; shuffle so load_smallnorb's
    # lexsort actually has work to do
    perm = np.random.default_rng(0).permutation(n)
    dat, grid = dat[perm], grid[perm]
    write_norb_matrix(dat_p, dat)
    write_norb_matrix(os.path.join(folder, PREFIX + "-cat.mat"),
                      grid[:, 0].astype(np.int32))
    write_norb_matrix(os.path.join(folder, PREFIX + "-info.mat"),
                      grid[:, 1:].astype(np.int32))
    if verbose:
        print(f"wrote {folder} ({dat.nbytes / 1e6:.0f} MB dat)")
    return folder


if __name__ == "__main__":
    ensure_smallnorb_standin(sys.argv[1] if len(sys.argv) > 1 else "Data/")
