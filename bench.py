"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: training images/sec/chip for the standard VAE backbone at
64x64x3 (the reference's common config, e.g.
/root/reference/configs/vae.yaml).

``vs_baseline`` is HONEST-MEASURED: the torch reference implementation
(/root/reference/models/vanilla_vae.py + its Adam recipe) is timed on
THIS host's CPU in the same run, and the ratio is reported against that
measurement (``baseline`` names exactly what was measured). BASELINE.md's
aspirational target (>=4x a single A100) cannot be measured here — no
A100 exists on this host and the zero-egress sandbox forbids fetching a
citable third-party number — so no invented GPU anchor is used.

The JSON line also carries the FLAGSHIP model: CT-MCQ-VAE step numbers
(action/base at batch 128, causal at batch 16 — the headline
configs/ct_mcq_vae.yaml shapes), so a regression in the novel model's
compute path is visible in BENCH_r*.json.

Roofline context (v5e, B=1024 bf16): the compiled VAE step reads/writes
8.7 GB at 34 flop/byte — a memory-bound workload whose HBM-bandwidth
bound is ~10.7 ms/step; the measured ~10 ms/step (~103k img/s) is AT
the roofline, i.e. the remaining gap to the 197-TFLOP/s compute peak is
physics (BatchNorm + small-channel convs), not implementation.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import optax

from ctvae_tpu.models import vae_models
from ctvae_tpu.parallel import make_mesh, replicated, shard_batch
from ctvae_tpu.training import create_train_state, make_train_step

BATCH = 1024
IMG = 64
WARMUP_STEPS = 5
BENCH_STEPS = 200
V5E_BF16_PEAK_TFLOPS = 197.0
CT_STEPS = 50


def measure_torch_reference_cpu(steps=4, batch=16):
    """Train-step img/s of the actual torch reference VanillaVAE on this
    host's CPU — the only reference throughput measurable in this
    sandbox. Returns None if torch or the reference checkout is absent."""
    try:
        import os
        import sys as _sys
        import types

        import numpy as np
        import torch

        if not os.path.isdir("/root/reference"):
            return None
        for name in ("torchvision", "torchvision.models",
                     "torch_geometric", "torch_geometric.nn",
                     "torch_geometric.utils"):
            if name not in _sys.modules:
                _sys.modules[name] = types.ModuleType(name)
        _sys.modules["torchvision"].models = _sys.modules["torchvision.models"]
        if not hasattr(_sys.modules["torchvision.models"], "vgg19_bn"):
            _sys.modules["torchvision.models"].vgg19_bn = lambda *a, **k: None
        gnn = _sys.modules["torch_geometric.nn"]
        for attr in ("GATv2Conv", "GATConv"):
            if not hasattr(gnn, attr):
                setattr(gnn, attr, torch.nn.Identity)
        if not hasattr(gnn, "Sequential"):
            gnn.Sequential = lambda *a, **k: torch.nn.Identity()
        _sys.path.insert(0, "/root/reference")
        try:
            import importlib
            mod = importlib.import_module("models.vanilla_vae")
        finally:
            _sys.path.remove("/root/reference")

        torch.manual_seed(0)
        ref = mod.VanillaVAE(3, 128)
        ref.train()
        opt = torch.optim.Adam(ref.parameters(), lr=1e-3)
        x = torch.rand(batch, 3, IMG, IMG)
        # warmup one step (allocator, thread pools)
        out = ref.forward(x)
        loss = ref.loss_function(*out, M_N=0.005)["loss"]
        opt.zero_grad(); loss.backward(); opt.step()
        t0 = time.perf_counter()
        for _ in range(steps):
            out = ref.forward(x)
            loss = ref.loss_function(*out, M_N=0.005)["loss"]
            opt.zero_grad(); loss.backward(); opt.step()
        dt = time.perf_counter() - t0
        return steps * batch / dt
    except Exception as e:  # never let the baseline probe kill the bench
        print(f"warning: torch reference CPU probe failed: {e!r}",
              file=sys.stderr)
        return None


def bench_ct_step(mode, batch):
    """ms/step of the CT-MCQ-VAE train step at the headline config
    (configs/ct_mcq_vae.yaml shapes) — bounded-queue methodology."""
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
                               fwd_kwargs_keys=("input_y", "action", "mode"))
    step = jax.jit(
        make_train_step(model, txs, M_N=0.00025,
                        fwd_kwargs_keys=(("input_y", "action")
                                         if mode != "base" else ()),
                        static_fwd_kwargs={"mode": mode}),
        donate_argnums=0)
    compiled = step.lower(state, batch_d).compile()
    for _ in range(3):
        state, metrics = compiled(state, batch_d)
    _ = float(metrics["Reconstruction_Loss"])
    t0 = time.perf_counter()
    _ = float(metrics["loss"])
    rtt = time.perf_counter() - t0
    n_fetches = 0
    t0 = time.perf_counter()
    for i in range(CT_STEPS):
        state, metrics = compiled(state, batch_d)
        if (i + 1) % 10 == 0:   # bound the async queue (tunnel collapse)
            _ = float(metrics["loss"])
            n_fetches += 1
    final = float(metrics["loss"])
    dt = max(time.perf_counter() - t0 - rtt * n_fetches, 1e-9)
    assert final == final, f"CT {mode} loss is NaN"
    return dt / CT_STEPS * 1e3


def bench_inference_vanilla(batch=2048):
    """Serving throughput: jitted VanillaVAE reconstruct (the serving
    subsystem's `reconstruct` entry point) img/s at 64x64 bf16."""
    from ctvae_tpu.models.base import RNG_STREAMS
    from ctvae_tpu.serving import make_inference_fn

    model = vae_models["VanillaVAE"](in_channels=3, latent_dim=128,
                                     img_size=IMG, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (batch, IMG, IMG, 3), jnp.float32)
    rngs = {"params": rng, **{s: jax.random.fold_in(rng, i + 1)
                              for i, s in enumerate(RNG_STREAMS)}}
    variables = model.init(rngs, x, train=False)
    infer = jax.jit(make_inference_fn(model, variables, "reconstruct"))
    key = jax.random.PRNGKey(1)
    out = infer(key, x)
    _ = float(out[0, 0, 0, 0])          # force compile + first run
    probe = jax.device_put(jnp.float32(0)) + 1
    probe.block_until_ready()
    t0 = time.perf_counter()
    _ = float(probe)
    rtt = time.perf_counter() - t0
    steps, n_fetches = 50, 0
    t0 = time.perf_counter()
    for i in range(steps):
        out = infer(key, x)
        if (i + 1) % 10 == 0:           # bound the async queue
            _ = float(out[0, 0, 0, 0])
            n_fetches += 1
    dt = max(time.perf_counter() - t0 - rtt * n_fetches, 1e-9)
    return steps * batch / dt


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
        # RTT on a fresh ready scalar (re-fetching metrics["loss"] would
        # hit its host-side cache and measure ~0)
        probe = jax.device_put(jnp.float32(0)) + 1
        probe.block_until_ready()
        t0 = time.perf_counter()
        _ = float(probe)
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
        print(f"warning: measured {tflops:.0f} TFLOP/s/chip exceeds "
              f"hardware peak; timing untrustworthy", file=sys.stderr)

    img_per_sec = BENCH_STEPS * BATCH / dt
    per_chip = img_per_sec / n_chips

    # flagship model: CT-MCQ-VAE step timings (never let them kill the
    # primary metric)
    ct = {}
    for key, mode, b in (("ct_action_ms_per_step", "action", 128),
                         ("ct_base_ms_per_step", "base", 128),
                         ("ct_causal_ms_per_step", "causal", 16)):
        try:
            ct[key] = round(bench_ct_step(mode, b), 2)
        except Exception as e:
            print(f"warning: CT bench ({mode}) failed: {e!r}",
                  file=sys.stderr)
            ct[key] = None
    if ct.get("ct_action_ms_per_step"):
        ct["ct_action_img_per_sec"] = round(
            128 * 1e3 / ct["ct_action_ms_per_step"], 0)

    try:
        infer_ips = round(bench_inference_vanilla(), 0)
    except Exception as e:
        print(f"warning: inference bench failed: {e!r}", file=sys.stderr)
        infer_ips = None

    torch_cpu = measure_torch_reference_cpu()
    vs = round(per_chip / torch_cpu, 3) if torch_cpu else None
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": vs,
        "baseline": "torch reference VanillaVAE, measured on this "
                    "host's CPU in the same run (no A100 available; "
                    "BASELINE.md's 4x-A100 target has no measurable or "
                    "citable anchor in this sandbox)",
        "torch_cpu_img_per_sec": round(torch_cpu, 1) if torch_cpu else None,
        "tflops_per_chip": round(tflops, 1) if step_flops else None,
        "infer_images_per_sec": infer_ips,
        **ct,
    }))


if __name__ == "__main__":
    main()
