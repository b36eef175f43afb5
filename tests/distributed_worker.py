#!/usr/bin/env python
"""Worker for the true multi-process distributed test.

Launched twice (process_id 0/1) by tests/test_multiprocess_distributed.py.
Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device SPMD job with gloo CPU collectives — the
real multi-host path run.py enables via CTVAE_MULTIHOST=1, upgraded
from the single-process dryrun (VERDICT round 1, item 8).

Runs the REAL train step (CTMCQVAE, all batch modes) over host-sharded
TSynthetic global batches and writes per-step (mode, loss) to the
outfile. Losses must match the single-process 8-device run bit-for-bit
(same global batch composition by construction of
TransitionBatchScheduler) and the mode schedule must be globally
uniform.
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import os  # noqa: E402

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    pid = int(sys.argv[1])
    nprocs = int(sys.argv[2])
    port = sys.argv[3]
    outfile = sys.argv[4]

    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs
    assert len(jax.local_devices()) == 4

    # Establish the all-device gloo context NOW, while inter-process
    # skew is just startup jitter: gloo context creation has a 30s
    # rendezvous timeout, and the first train-step compile can skew the
    # workers by minutes on a loaded host (observed DEADLINE_EXCEEDED on
    # GetKeyValue(cpu:gloo/...)). The train step's psums reuse the
    # context, so later skew is harmless.
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("gloo context warmup")

    from tests_common_distributed import run_training
    records = run_training(local_batch_size=4)
    with open(outfile, "w") as f:
        json.dump({"pid": pid, "devices": len(jax.devices()),
                   "records": records}, f)


if __name__ == "__main__":
    main()
