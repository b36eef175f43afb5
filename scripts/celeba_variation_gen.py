#!/usr/bin/env python
"""Offline transition-pair generator for CelebA.

Same semantics and output schema as the reference
(/root/reference/utils/celeba_variation_gen.py:14-88): take the first 10
of CelebA's 40 binary attributes; group images by "all attributes equal
except one" hashes; within each group pair up to 8 negative with up to 8
positive instances from the same train/valid/test split; write both
directions to ``Data/celeba/variation_attrs_10.txt`` (CSV
``,Inputs,Outputs,Variations,Sources,Targets,Splits`` keyed by image
*filename*, matching ``TCeleba``'s ``indices_alias="filename"``).

Usage: ``python scripts/celeba_variation_gen.py [data_root]``
"""

from __future__ import annotations

import csv
import os
import random
import sys
from collections import Counter

MAX_VARIATIONS = 10
MAX_INSTANCES_PER_VARIATION = 8


def generate(data_root: str = "Data/", seed: int = 0) -> None:
    folder = os.path.join(data_root, "celeba")
    attr_path = os.path.join(folder, "list_attr_celeba.txt")
    split_path = os.path.join(folder, "list_eval_partition.txt")

    with open(attr_path) as f:
        _, _labels, *lines = f.readlines()

    hashes = {}
    for line in lines:
        parts = line.split()
        if not parts:
            continue
        img_name, *attrs = parts
        attrs = [int(a) for a in attrs][:MAX_VARIATIONS]
        for variation in range(len(attrs)):
            key_attrs = list(attrs)
            key_attrs[variation] = "?"
            key = (variation, tuple(key_attrs))
            entry = hashes.setdefault(key, {"neg": [], "pos": []})
            entry["pos" if attrs[variation] == 1 else "neg"].append(img_name)

    img_splits = {}
    with open(split_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                img_splits[parts[0]] = int(parts[1])

    rng = random.Random(seed)
    rows = []
    uniques = set()
    for (variation, _), h in hashes.items():
        negs = rng.choices(h["neg"], k=min(MAX_INSTANCES_PER_VARIATION,
                                           len(h["neg"]))) if h["neg"] else []
        poss = rng.choices(h["pos"], k=min(MAX_INSTANCES_PER_VARIATION,
                                           len(h["pos"]))) if h["pos"] else []
        for img_neg in negs:
            for img_pos in poss:
                if img_splits.get(img_pos) != img_splits.get(img_neg) or \
                        (img_neg, img_pos) in uniques:
                    continue
                spl = img_splits[img_pos]
                rows.append((img_neg, img_pos, variation, 0, 1, spl))
                rows.append((img_pos, img_neg, variation, 1, 0, spl))
                uniques.add((img_neg, img_pos))
                uniques.add((img_pos, img_neg))

    out_path = os.path.join(folder, f"variation_attrs_{MAX_VARIATIONS}.txt")
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["", "Inputs", "Outputs", "Variations", "Sources",
                    "Targets", "Splits"])
        for i, r in enumerate(rows):
            w.writerow([i, *r])
    print(f"{len(rows)} transitions "
          f"({Counter(r[2] for r in rows)}) -> {out_path}")


if __name__ == "__main__":
    generate(sys.argv[1] if len(sys.argv) > 1 else "Data/")
