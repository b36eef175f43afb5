#!/usr/bin/env python
"""Pre-build the persisted transform caches (tcache_*) for every
stand-in dataset under Data/ so timed runs (bench.py e2e legs) measure
the steady-state pipeline, not the one-time cache build.

Safe to re-run: datasets whose cache already exists finish in O(ms)
(the cache is memory-mapped back). Skips datasets whose stand-in is
not on disk. Usage: python scripts/warm_caches.py [data_root]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ctvae_tpu.data import VAEDataset

SPECS = [
    ("DSprites", "dsprites/dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz",
     1024),
    ("TDSprites", "dsprites/variation_attrs_5.txt", 128),
    ("Shapes3D", "3dshapes/3dshapes.h5", 1024),
    ("Cars3D", "cars3d/cars", 256),
    ("SmallNORB",
     "smallnorb/smallnorb-5x46789x9x18x6x2x96x96-training-dat.mat", 256),
    ("Sprites", "sprites/sprites.npz", 1024),
]


def main(root="Data/"):
    for name, probe, bs in SPECS:
        if not os.path.exists(os.path.join(root, probe)):
            print(f"{name}: stand-in missing, skipped", flush=True)
            continue
        t0 = time.time()
        try:
            data = VAEDataset(root, dataset_name=name,
                              train_batch_size=bs, val_batch_size=bs,
                              patch_size=64, distributed=False,
                              cache_transformed=True,
                              device_normalize=True)
            data.setup()
            print(f"{name}: warm in {time.time() - t0:.1f}s", flush=True)
        except Exception as e:
            print(f"{name}: FAIL {e!r}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "Data/")
