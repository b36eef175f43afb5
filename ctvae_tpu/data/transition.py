"""Transition datasets + mode-homogeneous batch scheduling.

Parity target: /root/reference/datasets/transition.py.

``TransitionDataset`` wraps any adapter dataset and adds (x, y, action)
transition pairs from ``variation_attrs_{N}.txt``. The virtual index
space is [0, len(ds)) = base, [ld, ld+lt) = action, [ld+lt, ld+2lt) =
causal (reference :70-106). Actions are 2N-dim one-hots: index
``N*direction + variation`` where direction = (target < source)
(reference :64-68).

``TransitionBatchScheduler`` replaces the reference's
``TransitionBatchSampler`` + torch ``DistributedSampler`` combo
(:128-193): a deterministic, seeded, per-epoch schedule of
(mode, index-batch) pairs. Multi-host semantics differ from the
reference BY DESIGN: the DistributedSampler round-robins batches so
ranks can see *different modes* in the same step — which is why the
reference needs DDP ``find_unused_parameters``. Under SPMD every host
executes the same jitted program per step, so the mode must be globally
uniform: the scheduler builds GLOBAL batches of ``batch_size *
num_hosts`` indices and host h takes its contiguous slice — same mode
everywhere, disjoint data, one compiled step.
"""

from __future__ import annotations

import csv
import os
from typing import Iterator, List, Optional, Tuple

import numpy as np

MODES = ("base", "action", "causal")


class TransitionDataset:
    """Wraps a dataset exposing split/root/base_folder/indices."""

    def __init__(self, dataset, num_variations: int = 40,
                 split: str = "train", root: str = "Data/",
                 base_folder: str = "celeba",
                 indices: Optional[List[str]] = None,
                 override_args: bool = False, **kwargs):
        self.dataset = dataset
        self.num_variations = num_variations
        self.split = getattr(dataset, "split", split) if not override_args else split
        self.root = getattr(dataset, "root", root) if not override_args else root
        self.base_folder = (getattr(dataset, "base_folder", base_folder)
                            if not override_args else base_folder)
        self.indices = (getattr(dataset, "indices", indices)
                        if not override_args else indices)
        self._index_of = {name: i for i, name in enumerate(self.indices)}
        self._full_data = getattr(dataset, "_full_data", dataset)

        rows = self._load_t_csv(f"variation_attrs_{num_variations}.txt")
        split_map = {"train": (0,), "valid": (1,), "test": (2,),
                     "all": (0, 1, 2)}
        keep = split_map[self.split]
        self.transitions: List[Tuple[str, str]] = []
        actions = []
        for inp, out, variation, source, target, spl in rows:
            if spl in keep:
                self.transitions.append((inp, out))
                direction = int(target < source)
                a = np.zeros(2 * num_variations, np.float32)
                a[num_variations * direction + variation] = 1.0
                actions.append(a)
        self.actions = (np.stack(actions) if actions
                        else np.zeros((0, 2 * num_variations), np.float32))

    def _load_t_csv(self, filename: str):
        path = os.path.join(self.root, self.base_folder, filename)
        with open(path) as f:
            data = list(csv.reader(f))[1:]
        return [(r[1], r[2], int(r[3]), int(r[4]), int(r[5]), int(r[6]))
                for r in data]

    # -- virtual index space (reference :86-109) -------------------------

    def __len__(self) -> int:
        return len(self.dataset) + 2 * len(self.transitions)

    def mode_ranges(self):
        ld, lt = len(self.dataset), len(self.transitions)
        return {"base": range(ld), "action": range(ld, ld + lt),
                "causal": range(ld + lt, ld + 2 * lt)}

    def __getitem__(self, idx: int):
        ld, lt = len(self.dataset), len(self.transitions)
        if idx < ld:
            X, target = self.dataset[idx]
            return X, target, {"mode": "base"}
        mode = "action" if idx < ld + lt else "causal"
        t = idx - ld if mode == "action" else idx - ld - lt
        x_name, y_name = self.transitions[t]
        X, target = self.dataset[self._index_of[x_name]]
        Y, _ = self.dataset[self._index_of[y_name]]
        return X, target, {"action": self.actions[t], "input_y": Y,
                           "mode": mode}

    def get_batch(self, idxs: np.ndarray, mode: str):
        """Vectorized batch fetch; all idxs must share ``mode``."""
        ld, lt = len(self.dataset), len(self.transitions)
        idxs = np.asarray(idxs)
        if mode == "base":
            if hasattr(self.dataset, "get_batch"):
                imgs, labels = self.dataset.get_batch(idxs)
            else:
                pairs = [self.dataset[int(i)] for i in idxs]
                imgs = np.stack([p[0] for p in pairs])
                labels = np.stack([np.asarray(p[1]) for p in pairs])
            return {"image": imgs, "labels": labels}
        t = idxs - ld if mode == "action" else idxs - ld - lt
        x_ids = np.array([self._index_of[self.transitions[int(i)][0]]
                          for i in t])
        y_ids = np.array([self._index_of[self.transitions[int(i)][1]]
                          for i in t])
        if hasattr(self.dataset, "get_batch"):
            imgs, labels = self.dataset.get_batch(x_ids)
            imgs_y, _ = self.dataset.get_batch(y_ids)
        else:
            px = [self.dataset[int(i)] for i in x_ids]
            py = [self.dataset[int(i)] for i in y_ids]
            imgs = np.stack([p[0] for p in px])
            labels = np.stack([np.asarray(p[1]) for p in px])
            imgs_y = np.stack([p[0] for p in py])
        return {"image": imgs, "labels": labels, "input_y": imgs_y,
                "action": self.actions[t]}


class TransitionBatchScheduler:
    """Deterministic per-epoch schedule of mode-homogeneous batches."""

    def __init__(self, data: TransitionDataset, batch_size: int,
                 shuffle: bool = True, drop_last: bool = True,
                 limit: Optional[int] = None, seed: int = 0,
                 host_id: int = 0, num_hosts: int = 1):
        self.data = data
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.limit = limit
        self.seed = seed
        self.host_id = host_id
        self.num_hosts = num_hosts

    def _mode_indices(self, rng: np.random.Generator):
        out = {}
        for mode, rr in self.data.mode_ranges().items():
            idx = np.array(list(rr), np.int64)
            if self.limit is not None and len(idx) > 0:
                idx = rng.choice(idx, size=min(self.limit, len(idx)),
                                 replace=False)
            out[mode] = idx
        return out

    def epoch(self, epoch: int) -> Iterator[Tuple[str, np.ndarray]]:
        """Yields (mode, indices) with len(indices) == batch_size; at step
        t every host yields the SAME mode (a slice of one global batch)."""
        rng = np.random.default_rng((self.seed, epoch))
        per_mode = self._mode_indices(rng)
        gbs = self.batch_size * self.num_hosts
        batches: List[Tuple[str, np.ndarray]] = []
        for mode, idx in per_mode.items():
            if self.shuffle:
                idx = rng.permutation(idx)
            n_full = len(idx) // gbs
            for b in range(n_full):
                batches.append((mode, idx[b * gbs:(b + 1) * gbs]))
            if not self.drop_last and len(idx) % gbs:
                batches.append((mode, idx[n_full * gbs:]))
        if self.shuffle:
            order = rng.permutation(len(batches))
            batches = [batches[i] for i in order]
        lo = self.host_id * self.batch_size
        return iter((mode, g[lo:lo + self.batch_size]) for mode, g in batches)

    def batches_per_epoch(self) -> int:
        gbs = self.batch_size * self.num_hosts
        total = 0
        for mode, rr in self.data.mode_ranges().items():
            n = len(rr) if self.limit is None else min(self.limit, len(rr))
            total += n // gbs if self.drop_last else -(-n // gbs)
        return total
