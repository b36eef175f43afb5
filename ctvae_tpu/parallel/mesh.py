"""Device mesh + sharding helpers.

The reference scales with PyTorch-Lightning DDP over NCCL
(/root/reference/run.py:18,99-100). The TPU-native equivalent is SPMD:
one jitted train step over a ``jax.sharding.Mesh``; the batch is sharded
over the ``data`` axis, parameters are replicated (or sharded over
``model`` for the wide CT-VAE layers), and XLA inserts the gradient
all-reduce over ICI automatically from the sharding annotations.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              model_axis: int = 1) -> Mesh:
    """Mesh over all (or given) devices: ``(data, model)``. ``model_axis=1``
    gives pure data parallelism — all the reference needs (SURVEY.md §2.5);
    a larger ``model_axis`` shards the wide CT/discoverer matmuls too."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_axis == 0, (n, model_axis)
    arr = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, jax.Array], mesh: Mesh) -> Dict[str, jax.Array]:
    """Device-put a host batch with the leading dim sharded over ``data``."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}
