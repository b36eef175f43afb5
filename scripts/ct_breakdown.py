#!/usr/bin/env python
"""Per-bucket device-time breakdown of the CT train steps at the bench
headline shapes (bench.py bench_ct_step config) — the accounting behind
BENCH_r05's ``ct_<mode>_breakdown_ms`` (round-4 VERDICT item 1).

Run on the real chip:  python scripts/ct_breakdown.py [mode] [batch]
Prints one JSON line per mode with per-bucket ms/step, total device
ms/step, measured wall ms/step, and the dispatch/idle residual.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

from ctvae_tpu.models import vae_models
from ctvae_tpu.training import create_train_state, make_train_step
from ctvae_tpu.utils.profiling import device_step_breakdown

IMG = 64


def build(mode, batch):
    model = vae_models["CTMCQVAE"](
        in_channels=3, embedding_dim=128, action_dim=12,
        hidden_dims=(64, 128, 256), num_embeddings=64, img_size=IMG,
        codebooks=1, beta=0.1, gamma=1.5, c_alpha=0.01, c_beta=0.4,
        c_delta=0.01, c_epsilon=0.1, noise="off", dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    batch_d = {
        "image": jax.random.uniform(k1, (batch, IMG, IMG, 3), jnp.float32),
        "input_y": jax.random.uniform(k2, (batch, IMG, IMG, 3),
                                      jnp.float32),
        "action": jax.nn.one_hot(
            jax.random.randint(k3, (batch,), 0, 12), 12),
    }
    txs = [optax.adam(5e-4)]
    state = create_train_state(model, rng, batch_d, txs,
                               fwd_kwargs_keys=("input_y", "action",
                                                "mode"))
    step = jax.jit(
        make_train_step(model, txs, M_N=0.00025,
                        fwd_kwargs_keys=(("input_y", "action")
                                         if mode != "base" else ()),
                        static_fwd_kwargs={"mode": mode}),
        donate_argnums=0)
    return step.lower(state, batch_d).compile(), state, batch_d


def breakdown(mode, batch, steps=5):
    compiled, state, batch_d = build(mode, batch)
    holder = {"state": state}

    for _ in range(3):                      # warmup, queue settled
        holder["state"], metrics = compiled(holder["state"], batch_d)
    _ = float(metrics["loss"])

    # wall ms/step with the bounded-queue methodology (bench.py)
    t0 = time.perf_counter()
    _ = float(metrics["loss"])
    rtt = time.perf_counter() - t0
    n = 30
    t0 = time.perf_counter()
    for i in range(n):
        holder["state"], metrics = compiled(holder["state"], batch_d)
        if (i + 1) % 10 == 0:
            _ = float(metrics["loss"])
    wall_ms = (time.perf_counter() - t0 - rtt * 3) / n * 1e3

    def args_fn():
        return (holder["state"], batch_d)

    def run_step(st, bd):
        holder["state"], m = compiled(st, bd)
        return m

    class _Run:
        def __call__(self, st, bd):
            holder["state"], m = compiled(st, bd)
            return m

        def as_text(self):
            return compiled.as_text()

    buckets = device_step_breakdown(_Run(), args_fn, steps=steps)
    out = {"mode": mode, "batch": batch, "wall_ms": round(wall_ms, 3),
           **buckets}
    if "device_ms" in buckets:
        out["dispatch_idle_ms"] = round(wall_ms - buckets["device_ms"], 3)
    return out


if __name__ == "__main__":
    modes = [sys.argv[1]] if len(sys.argv) > 1 else ["causal", "action",
                                                     "base"]
    for m in modes:
        b = (int(sys.argv[2]) if len(sys.argv) > 2
             else (16 if m == "causal" else 128))
        print(json.dumps(breakdown(m, b)), flush=True)
