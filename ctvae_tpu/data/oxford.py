"""OxfordPets adapter (vestigial in the reference but part of the surface,
/root/reference/datasets/oxford_dataset.py:8-31): 75/25 file split over
``OxfordPets/images/*.jpg``, dummy label 0."""

from __future__ import annotations

import os
from typing import Callable, Optional

import numpy as np
from PIL import Image

from .transforms import StandardTransform


class OxfordPets:
    base_folder = "OxfordPets"

    def __init__(self, data_dir: str, split: str = "train",
                 transform: Optional[Callable] = None, **kwargs):
        self.root = data_dir
        self.split = split
        self.transform = transform or StandardTransform(64)
        folder = os.path.join(data_dir, self.base_folder, "images")
        if not os.path.isdir(folder):
            raise FileNotFoundError(f"OxfordPets images not found at {folder}")
        imgs = sorted(f for f in os.listdir(folder)
                      if f.endswith((".jpg", ".png")))
        cut = int(len(imgs) * 0.75)
        self.filename = imgs[:cut] if split == "train" else imgs[cut:]
        self.indices = self.filename

    def __len__(self):
        return len(self.filename)

    def __getitem__(self, idx: int):
        path = os.path.join(self.root, self.base_folder, "images",
                            self.filename[idx])
        img = np.asarray(Image.open(path).convert("RGB"))
        return self.transform(img), np.float32(0.0)
