"""Checkpointing — orbax-backed, replicating the reference's
``ModelCheckpoint(save_top_k=2, monitor="val_Reconstruction_Loss",
save_last=True)`` (/root/reference/run.py:94-97) plus the weights-only
restore path (/root/reference/run.py:85-89: load ``state_dict``, strip
the ``"model."`` prefix, non-strict, optimizers start fresh — used for
the CT-VAE two-stage recipe).

Top-k/last bookkeeping is done here (small JSON index) on top of plain
orbax ``PyTreeCheckpointer`` saves, which keeps us independent of
``CheckpointManager`` API churn.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


class CheckpointManager:
    """Saves TrainState pytrees under ``ckpt_dir``; keeps the best
    ``top_k`` by a monitored scalar (lower is better) plus ``last``."""

    def __init__(self, ckpt_dir: str, top_k: int = 2,
                 monitor: str = "val_Reconstruction_Loss",
                 async_save: bool = False):
        self.dir = os.path.abspath(ckpt_dir)
        self.top_k = top_k
        self.monitor = monitor
        # async_save overlaps the disk write with the next training
        # epoch: save() snapshots device state to host (donation-safe),
        # then writes on a background thread. wait() joins the in-flight
        # write; restore() waits implicitly. Writes are serialized, so
        # the on-disk layout is identical to sync mode.
        self.async_save = async_save
        self._pending: Optional[threading.Thread] = None
        self._pending_exc: Optional[BaseException] = None
        os.makedirs(self.dir, exist_ok=True)
        self._index_path = os.path.join(self.dir, "index.json")
        self._index = self._load_index()

    def _load_index(self) -> Dict[str, Any]:
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                return json.load(f)
        return {"best": []}  # list of {"step", "score", "path"}

    def _write_index(self) -> None:
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=2)

    # -- save ------------------------------------------------------------

    def wait(self) -> None:
        """Join any in-flight async write; re-raise its exception (a
        silently-failed checkpoint must not read as success)."""
        if self._pending is not None:
            self._pending.join()
            self._pending = None
        if self._pending_exc is not None:
            exc, self._pending_exc = self._pending_exc, None
            raise exc

    def save(self, state, step: int,
             metrics: Optional[Dict[str, float]] = None) -> None:
        host_state = jax.device_get(state)   # block: caller may donate
        self.wait()                          # serialize writes
        if self.async_save:
            def _guarded():
                try:
                    self._write(host_state, step, metrics)
                except BaseException as e:   # surfaced by the next wait()
                    self._pending_exc = e
            # non-daemon: the interpreter joins it at shutdown, so a
            # crash elsewhere cannot cut the write off mid-rmtree/save
            t = threading.Thread(target=_guarded, daemon=False)
            t.start()
            self._pending = t
        else:
            self._write(host_state, step, metrics)

    def _save_atomic(self, ckpt, path: str, host_state) -> None:
        """Write a checkpoint directory crash-safely: save to a tmp dir,
        then swap it in via rename (atomic on one filesystem). A hard
        kill (real preemption is SIGKILL — the non-daemon writer thread
        only covers Python-level crashes) at any instant leaves either
        the complete old directory or the complete new one at ``path``
        (or, in the one instant between the two renames, the old one at
        ``path + '.old'`` — see the restore() fallback)."""
        tmp, old = path + ".tmp", path + ".old"
        for d in (tmp, old):
            if os.path.exists(d):
                shutil.rmtree(d)
        ckpt.save(tmp, host_state)
        if os.path.exists(path):
            os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old, ignore_errors=True)

    def _write(self, host_state, step: int,
               metrics: Optional[Dict[str, float]]) -> None:
        ckpt = _checkpointer()
        last = os.path.join(self.dir, "last")
        self._save_atomic(ckpt, last, host_state)

        score = None if metrics is None else metrics.get(self.monitor)
        if score is None:
            self._write_index()
            return
        path = os.path.join(self.dir, f"step_{step}")
        self._save_atomic(ckpt, path, host_state)
        best = self._index["best"]
        best.append({"step": step, "score": float(score), "path": path})
        best.sort(key=lambda e: e["score"])
        for evicted in best[self.top_k:]:
            if os.path.exists(evicted["path"]):
                shutil.rmtree(evicted["path"])
        self._index["best"] = best[:self.top_k]
        self._write_index()

    # -- restore ---------------------------------------------------------

    def restore(self, target, which: str = "last"):
        """Full-state restore: ``which`` is 'last', 'best', or a path."""
        self.wait()
        path = {"last": os.path.join(self.dir, "last"),
                "best": self._index["best"][0]["path"]
                if self._index["best"] else None}.get(which, which)
        if path is not None and not os.path.exists(path) \
                and os.path.exists(path + ".old"):
            # a preemption landed between _save_atomic's two renames:
            # the previous complete checkpoint is parked at .old
            path = path + ".old"
        if path is None or not os.path.exists(path):
            raise FileNotFoundError(f"no checkpoint at {path!r}")
        return _checkpointer().restore(os.path.abspath(path), item=target)


def load_weights_only(path: str, params: Any) -> Any:
    """Restore ONLY model parameters from a checkpoint directory into an
    existing params pytree, non-strict: leaves present in both trees (by
    path, shape-compatible) are taken from the checkpoint, everything
    else keeps its fresh initialization. This is the JAX rendering of the
    reference's strip-``model.``-prefix + ``strict=False`` load
    (/root/reference/run.py:86-89)."""
    raw = _checkpointer().restore(os.path.abspath(path))
    src = raw.get("params", raw) if isinstance(raw, dict) else raw

    def merge(dst_node, src_node):
        if isinstance(dst_node, dict):
            if not isinstance(src_node, dict):
                return dst_node
            return {k: merge(v, src_node[k]) if k in src_node else v
                    for k, v in dst_node.items()}
        if src_node is None:
            return dst_node
        src_arr = np.asarray(src_node)
        if hasattr(dst_node, "shape") and src_arr.shape != dst_node.shape:
            return dst_node
        return src_arr

    return merge(params, src)
