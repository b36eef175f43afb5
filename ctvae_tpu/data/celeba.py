"""CelebA adapter — reads the standard torchvision on-disk layout
(``celeba/img_align_celeba/*.jpg``, ``list_eval_partition.txt``,
``list_attr_celeba.txt``) natively with PIL.

Parity target: /root/reference/datasets/celeba_dataset.py — ``MyCelebA``
bypasses the integrity check (:9-18); ``TCeleba`` wraps the transition
dataset with ``num_variations=10`` keyed by *filename*
(``indices_alias="filename"``, :21-27).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np
from PIL import Image

from .transforms import StandardTransform
from .transition import TransitionDataset


class MyCelebA:
    base_folder = "celeba"

    def __init__(self, data_dir: str, split: str = "train",
                 transform: Optional[Callable] = None, download: bool = False,
                 **kwargs):
        self.root = data_dir
        self.split = split
        self.transform = transform or StandardTransform(64)
        folder = os.path.join(data_dir, self.base_folder)
        part_file = os.path.join(folder, "list_eval_partition.txt")
        if not os.path.exists(part_file):
            raise FileNotFoundError(
                f"CelebA not found under {folder} (no network egress; place "
                "img_align_celeba/ + list_eval_partition.txt there)")
        names, splits = [], []
        with open(part_file) as f:
            for line in f:
                parts = line.split()
                if len(parts) == 2:
                    names.append(parts[0])
                    splits.append(int(parts[1]))
        want = {"train": 0, "valid": 1, "test": 2, "all": None}[split]
        self.filename = [n for n, s in zip(names, splits)
                         if want is None or s == want]
        # attributes (40 binary) for the conditional models
        attr_file = os.path.join(folder, "list_attr_celeba.txt")
        self.attr = {}
        if os.path.exists(attr_file):
            with open(attr_file) as f:
                lines = f.read().splitlines()
            for line in lines[2:]:
                parts = line.split()
                self.attr[parts[0]] = np.array(
                    [(int(v) + 1) // 2 for v in parts[1:]], np.float32)
        self.indices = self.filename
        self._full_data = self

    def __len__(self):
        return len(self.filename)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, self.base_folder,
                            "img_align_celeba", name)

    def __getitem__(self, idx: int):
        name = self.filename[idx]
        img = np.asarray(Image.open(self._path(name)).convert("RGB"))
        label = self.attr.get(name, np.zeros(40, np.float32))
        return self.transform(img), label

    def get_batch(self, idxs):
        """Vectorized fetch: fused native JPEG decode + crop + resize
        (threaded, see ctvae_tpu/native) with a PIL fallback."""
        from .. import native
        names = [self.filename[int(i)] for i in idxs]
        labels = np.stack([self.attr.get(n, np.zeros(40, np.float32))
                           for n in names])
        if native.available() and isinstance(self.transform,
                                             StandardTransform):
            imgs = native.load_jpeg_batch(
                [self._path(n) for n in names], self.transform.crop,
                self.transform.patch_size)
            return imgs, labels
        imgs = np.stack([self.transform(
            np.asarray(Image.open(self._path(n)).convert("RGB")))
            for n in names])
        return imgs, labels


def TCeleba(data_dir: str, split: str = "train",
            transform: Optional[Callable] = None, **kwargs):
    base = MyCelebA(data_dir, split=split, transform=transform, **kwargs)
    return TransitionDataset(base, num_variations=10)
