"""Experiment logging — TensorBoard (always) + wandb (optional).

Replaces the reference's dual TensorBoardLogger/WandbLogger stack
(/root/reference/run.py:37-45) and the ``log_all`` routing in
``VAEXperiment`` (/root/reference/experiment.py:87-110): 0-d values go
to scalar streams, 2-D/3-D arrays (e.g. ``ct_adjacency``, ``ct_mask``)
go to image streams, strings are dropped.

wandb is optional: if the package is absent or ``use_wandb`` is False
the logger silently becomes TensorBoard-only.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np


def _make_summary_writer(log_dir: str):
    """TensorBoard writer without a hard torch dependency: prefer
    tensorboardX, fall back to torch's bundled writer, and degrade to a
    local JSONL scalar log so a torch-free TPU VM still gets metrics."""
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(log_dir)
    except ImportError:
        pass
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(log_dir)
    except ImportError:
        return _JsonlWriter(log_dir)


class _JsonlWriter:
    """Minimal SummaryWriter-compatible fallback (scalars to JSONL,
    images to PNG-less .npy, text to .txt) — keeps the framework fully
    functional when neither tensorboardX nor torch is installed."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, name, value, step):
        self._f.write(json.dumps(
            {"step": int(step), name: float(value)}) + "\n")

    def add_image(self, name, img, step, dataformats="HWC"):
        safe = name.replace("/", "_")
        np.save(os.path.join(self.log_dir, f"{safe}_{step}.npy"),
                np.asarray(img))

    def add_text(self, name, text):
        safe = name.replace("/", "_")
        with open(os.path.join(self.log_dir, f"{safe}.txt"), "w") as f:
            f.write(text)

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()


class ExperimentLogger:

    def __init__(self, save_dir: str, name: str, version: Optional[int] = None,
                 use_wandb: bool = False, wandb_project: str = "CT-VAE",
                 hparams: Optional[dict] = None):
        base = os.path.join(save_dir, name)
        if version is None:
            version = _next_version(base)
        self.version = version
        self.log_dir = os.path.join(base, f"version_{version}")
        os.makedirs(self.log_dir, exist_ok=True)

        self.tb = _make_summary_writer(self.log_dir)
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                self.wandb = wandb.init(project=wandb_project, name=name,
                                        config=hparams or {},
                                        dir=self.log_dir)
            except Exception:
                self.wandb = None
        if hparams is not None:
            with open(os.path.join(self.log_dir, "hparams.json"), "w") as f:
                json.dump(_jsonable(hparams), f, indent=2, default=str)

    # -- routing (reference experiment.py:87-110) ------------------------

    def log_all(self, values: Dict[str, Any], step: int,
                prefix: str = "") -> Dict[str, float]:
        """Route a mixed dict of scalars/images; returns the scalar subset."""
        scalars: Dict[str, float] = {}
        for key, val in values.items():
            if isinstance(val, str):
                continue  # the reference drops the "mode" key the same way
            arr = np.asarray(val)
            name = prefix + key
            if arr.ndim == 0:
                scalars[name] = float(arr)
                self.tb.add_scalar(name, float(arr), step)
            elif arr.ndim in (2, 3):
                self.log_image(name, arr, step)
        if self.wandb is not None and scalars:
            self.wandb.log(scalars, step=step)
        return scalars

    def log_image(self, name: str, img: np.ndarray, step: int) -> None:
        img = np.asarray(img, np.float32)
        lo, hi = img.min(), img.max()
        img = (img - lo) / max(hi - lo, 1e-8)
        if img.ndim == 2:
            img = img[..., None]
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        self.tb.add_image(name, img, step, dataformats="HWC")
        if self.wandb is not None:
            try:
                import wandb
                self.wandb.log({name: wandb.Image(img)}, step=step)
            except Exception:
                pass

    def log_hyperparams(self, hparams: dict) -> None:
        self.tb.add_text("hparams", json.dumps(_jsonable(hparams), indent=2,
                                               default=str))

    def finish(self) -> None:
        self.tb.flush()
        self.tb.close()
        if self.wandb is not None:
            self.wandb.finish()


def _next_version(base: str) -> int:
    if not os.path.isdir(base):
        return 0
    versions = [int(d.split("_")[1]) for d in os.listdir(base)
                if d.startswith("version_") and d.split("_")[1].isdigit()]
    return max(versions) + 1 if versions else 0


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.integer, np.floating)):
        return obj.item()
    return obj
