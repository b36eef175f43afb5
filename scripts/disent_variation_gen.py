#!/usr/bin/env python
"""Offline transition-pair generator for the disent-family datasets.

Produces the same on-disk artifacts as the reference generator
(/root/reference/utils/disent_variation_gen.py:40-106), consumed by
``TransitionDataset``:

* ``Data/<name>/list_eval_partition.txt`` — CSV ``,Id,Split`` with a
  70/15/15 train/valid/test split, seeded 42,
* ``Data/<name>/variation_attrs_<F>.txt`` — CSV
  ``,Inputs,Outputs,Variations,Sources,Targets,Splits``: for every
  factor f and every adjacent value pair (v, v+1), up to 1000 random
  factor combinations whose two endpoints fall in the same split;
  both directions are written.

Usage: ``python scripts/disent_variation_gen.py <dataset_name> [data_root]``
"""

from __future__ import annotations

import csv
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from ctvae_tpu.data.disent_data import FACTOR_SIZES  # noqa: E402

MAX_INSTANCES_PER_VARIATION = 1000


def pos_to_idx(pos, sizes):
    idx = 0
    for p, s in zip(pos, sizes):
        idx = idx * s + p
    return idx


def generate(dataset_name: str, data_root: str = "Data/",
             seed: int = 42) -> None:
    sizes = FACTOR_SIZES[dataset_name]
    data_len = int(np.prod(sizes))
    folder = os.path.join(data_root, dataset_name)
    os.makedirs(folder, exist_ok=True)

    # -- split file (70/15/15, the reference's random_split(seed=42)) ----
    rng = np.random.default_rng(seed)
    n_valid = int(round(data_len * 0.15))
    n_test = int(round(data_len * 0.15))
    perm = rng.permutation(data_len)
    split_list = np.zeros(data_len, np.int64)
    split_list[perm[:n_valid]] = 1
    split_list[perm[n_valid:n_valid + n_test]] = 2
    with open(os.path.join(folder, "list_eval_partition.txt"), "w",
              newline="") as f:
        w = csv.writer(f)
        w.writerow(["", "Id", "Split"])
        for i in range(data_len):
            w.writerow([i, i, int(split_list[i])])
    print(f"split written: {np.bincount(split_list)}")

    # -- variation pairs -------------------------------------------------
    py_rng = random.Random(seed)
    rows = []
    uniques = set()
    for fct in range(len(sizes)):
        for v in range(sizes[fct] - 1):
            for _ in range(MAX_INSTANCES_PER_VARIATION):
                sample = [py_rng.randrange(s) for s in sizes]
                pos_s, pos_t = sample.copy(), sample.copy()
                pos_s[fct], pos_t[fct] = v, v + 1
                inp = pos_to_idx(pos_s, sizes)
                out = pos_to_idx(pos_t, sizes)
                if split_list[inp] != split_list[out] or \
                        (inp, out) in uniques:
                    continue
                spl = int(split_list[inp])
                rows.append((inp, out, fct, v, v + 1, spl))
                rows.append((out, inp, fct, v + 1, v, spl))
                uniques.add((inp, out))
                uniques.add((out, inp))
    n_factors = len(sizes)
    out_path = os.path.join(folder, f"variation_attrs_{n_factors}.txt")
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["", "Inputs", "Outputs", "Variations", "Sources",
                    "Targets", "Splits"])
        for i, r in enumerate(rows):
            w.writerow([i, *r])
    print(f"{len(rows)} transitions -> {out_path}")


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(f"Usage: {sys.argv[0]} <dataset_name> [data_root]")
        sys.exit(1)
    generate(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "Data/")
