"""Capture a device trace of the CT action train step and print the top
kernels by total device time. Parses the perfetto trace.json.gz that
jax.profiler writes — no TensorBoard needed.

Run: python scripts/profile_ct.py [batch] [mode]
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from collections import defaultdict

import jax
import jax.numpy as jnp
import optax

from ctvae_tpu.models import vae_models
from ctvae_tpu.training import create_train_state, make_train_step

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
MODE = sys.argv[2] if len(sys.argv) > 2 else "action"
IMG = 64
TRACE_DIR = "/tmp/ct_trace"


def main():
    model = vae_models["CTMCQVAE"](
        in_channels=3, embedding_dim=128, action_dim=12,
        hidden_dims=(64, 128, 256), num_embeddings=64, img_size=IMG,
        codebooks=1, beta=0.1, gamma=1.5, c_alpha=0.01, c_beta=0.4,
        c_delta=0.01, c_epsilon=0.1, noise="off", dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    batch = {
        "image": jax.random.uniform(k1, (BATCH, IMG, IMG, 3), jnp.float32),
        "input_y": jax.random.uniform(k2, (BATCH, IMG, IMG, 3), jnp.float32),
        "action": jax.nn.one_hot(
            jax.random.randint(k3, (BATCH,), 0, 12), 12),
    }
    txs = [optax.adam(5e-4)]
    state = create_train_state(model, rng, batch, txs,
                               fwd_kwargs_keys=("input_y", "action", "mode"))
    step = jax.jit(
        make_train_step(model, txs, M_N=0.00025,
                        fwd_kwargs_keys=("input_y", "action"),
                        static_fwd_kwargs={"mode": MODE}),
        donate_argnums=0)
    compiled = step.lower(state, batch).compile()
    for _ in range(3):
        state, metrics = compiled(state, batch)
    _ = float(metrics["loss"])

    with jax.profiler.trace(TRACE_DIR, create_perfetto_trace=True):
        for _ in range(5):
            state, metrics = compiled(state, batch)
        _ = float(metrics["loss"])

    paths = sorted(glob.glob(TRACE_DIR + "/**/*.trace.json.gz",
                             recursive=True))
    if not paths:
        print("no perfetto trace found under", TRACE_DIR)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)

    # device-track events only: keep events on TPU pids (track names carry
    # "TPU"), sum duration by op name
    tpu_pids = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            if "TPU" in ev.get("args", {}).get("name", ""):
                tpu_pids.add(ev["pid"])
    totals = defaultdict(float)
    count = defaultdict(int)
    grand = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in tpu_pids:
            totals[ev["name"]] += ev.get("dur", 0.0)
            count[ev["name"]] += 1
            grand += ev.get("dur", 0.0)
    print(f"total device time: {grand/1e3:.2f} ms over 5 steps "
          f"(batch={BATCH})")
    for name, dur in sorted(totals.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{dur/1e3:9.3f} ms  x{count[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
