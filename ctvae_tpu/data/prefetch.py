"""Background prefetch of host batches onto the device mesh.

The reference overlaps input work with compute via torch DataLoader
worker processes (/root/reference/dataset.py:100-166 ``num_workers``).
Under SPMD there is one host process per chip-set, so the overlap is a
thread: while the device executes step N (JAX dispatch is async), the
prefetcher assembles batches N+1..N+depth on the host.

The worker thread touches ONLY numpy — all JAX API calls (device_put)
happen on the consumer thread. Calling device_put concurrently from a
second thread while the main thread compiles aborts the runtime with a
C++ CHECK failure (observed on the CPU backend with multi-mode CT
training); host-side assembly still hides the expensive part (decode /
crop / resize / gather), and dispatch being async hides the H2D copy.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np

from ..parallel.mesh import shard_batch

_SENTINEL = object()
_u8_to_unit = None

# The only keys allowed to arrive as uint8: [0,255] image payloads under
# ``data_params.device_normalize``. Every other key must already carry
# its semantic dtype (float32 actions, int64 labels, ...) — see the
# enforcement below and the dataset contract in data/datamodule.py.
_U8_IMAGE_KEYS = frozenset({"image", "input_y"})


def _normalize_u8(arr):
    """uint8 device array -> float32 in [0, 1], ON DEVICE — the receiving
    half of ``data_params.device_normalize`` (the host ships 4x fewer
    bytes per batch; this jitted astype/255 matches the host conversion
    to within one float32 ulp and costs one ~40us HBM round trip)."""
    global _u8_to_unit
    if _u8_to_unit is None:
        import jax
        import jax.numpy as jnp
        _u8_to_unit = jax.jit(lambda x: x.astype(jnp.float32) / 255.0)
    return _u8_to_unit(arr)


def prefetch_to_device(batches: Iterator[dict], mesh, depth: int = 2,
                       ) -> Iterator[dict]:
    """Yields batches with array values device-put (sharded over the
    mesh's data axis), assembled ``depth`` steps ahead on a host thread.
    String values (the ``mode`` key) pass through untouched."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    err: list = []

    def worker():
        try:
            for batch in batches:
                # numpy-only: materialize/convert on the host thread
                host = {k: (v if isinstance(v, str) else np.asarray(v))
                        for k, v in batch.items()}
                q.put(host)
        except BaseException as e:  # surfaced in the consumer thread
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        arrays = {k: v for k, v in item.items() if not isinstance(v, str)}
        on_device = shard_batch(arrays, mesh)
        # One shared rule with experiment.py's setup/sample/repr paths:
        # EVERY uint8 array is a [0,255] image payload and gets the
        # on-device /255 (a future uint8 key can never silently reach
        # the jitted train step raw). That contract is enforced, not
        # assumed: a uint8 array under a non-image key is a loader bug
        # (e.g. packed class labels that would be silently rescaled to
        # [0,1] floats), so it fails loudly here instead.
        for k, v in on_device.items():
            if getattr(v, "dtype", None) == np.uint8:
                if k not in _U8_IMAGE_KEYS:
                    raise TypeError(
                        f"batch key '{k}' is uint8 but only "
                        f"{sorted(_U8_IMAGE_KEYS)} may ship as uint8 "
                        f"image payloads (data_params.device_normalize "
                        f"contract). Convert '{k}' to its semantic dtype "
                        f"(e.g. int32 labels, float32 actions) in the "
                        f"dataset, or add it to prefetch._U8_IMAGE_KEYS "
                        f"if it really is a [0,255] image.")
                on_device[k] = _normalize_u8(v)
        on_device.update({k: v for k, v in item.items()
                          if isinstance(v, str)})
        yield on_device
