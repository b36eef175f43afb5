"""Background prefetch of host batches onto the device mesh.

The reference overlaps input work with compute via torch DataLoader
worker processes (/root/reference/dataset.py:100-166 ``num_workers``).
Under SPMD there is one host process per chip-set, so the overlap is a
thread: while the device executes step N (JAX dispatch is async), the
prefetcher prepares and ``device_put``s batches N+1..N+depth, keeping
the H2D copy off the critical path.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import jax.numpy as jnp

from ..parallel.mesh import shard_batch

_SENTINEL = object()


def prefetch_to_device(batches: Iterator[dict], mesh, depth: int = 2,
                       ) -> Iterator[dict]:
    """Yields batches with array values device-put (sharded over the
    mesh's data axis) ``depth`` steps ahead of the consumer. String
    values (the ``mode`` key) pass through untouched."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    err: list = []

    def worker():
        try:
            for batch in batches:
                arrays = {k: jnp.asarray(v) for k, v in batch.items()
                          if not isinstance(v, str)}
                on_device = shard_batch(arrays, mesh)
                on_device.update({k: v for k, v in batch.items()
                                  if isinstance(v, str)})
                q.put(on_device)
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
        yield item
