"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: training images/sec/chip for the standard VAE backbone at
64x64x3 (the reference's common config, e.g.
/root/reference/configs/vae.yaml). ``vs_baseline`` is measured against
the BASELINE.md target of 4x a single-A100-class GPU; with no published
reference numbers (BASELINE.md), we anchor on a nominal 2000 img/s for
the reference PyTorch stack on its cu102-era hardware.
"""

import json
import time

import jax
import jax.numpy as jnp
import optax

from ctvae_tpu.models import vae_models
from ctvae_tpu.parallel import make_mesh, replicated, shard_batch
from ctvae_tpu.training import create_train_state, make_train_step

BASELINE_IMG_PER_SEC = 2000.0  # nominal reference-stack throughput
BATCH = 256
IMG = 64
WARMUP_STEPS = 5
BENCH_STEPS = 30


def main():
    model = vae_models["VanillaVAE"](in_channels=3, latent_dim=128,
                                     img_size=IMG, dtype=jnp.bfloat16)
    mesh = make_mesh()
    n_chips = len(jax.devices())
    rng = jax.random.PRNGKey(0)
    batch = {"image": jax.random.uniform(rng, (BATCH, IMG, IMG, 3),
                                         jnp.float32)}
    txs = [optax.adam(1e-3)]
    state = create_train_state(model, rng, batch, txs)
    step = jax.jit(make_train_step(model, txs, M_N=0.005), donate_argnums=0)

    with mesh:
        sbatch = shard_batch(batch, mesh)
        state = jax.device_put(state, replicated(mesh))
        for _ in range(WARMUP_STEPS):
            state, metrics = step(state, sbatch)
        jax.block_until_ready(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(BENCH_STEPS):
            state, metrics = step(state, sbatch)
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0

    img_per_sec = BENCH_STEPS * BATCH / dt
    per_chip = img_per_sec / n_chips
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
