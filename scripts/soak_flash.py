#!/usr/bin/env python
"""Soak test for the flash GATv2/pairwise Pallas path (round-4 VERDICT
weak item 2): run >=10k consecutive causal CT train steps on the real
chip under the SHIPPED default routing (CTVAE_FLASH_GAT=auto) and log
progress, to either reproduce the one unattributed execution hang seen
~7.5k steps into a round-4 long run, or certify the kernel unattended.

Mimics the e2e epoch structure that hit the hang: the headline-shape
program (B=128, configs/ct_mcq_vae.yaml shapes) interleaved with a
partial "epoch tail" batch (B=96) every --tail-every steps, so two
compiled executables alternate like a real multi-epoch run.

A watchdog thread monitors the host-side loss fetches: if a fetch takes
longer than --hang-timeout seconds the chip is considered wedged — the
incident is appended to the log as JSON and the process hard-exits
with code 3 (a wedged chip cannot be recovered in-process; see
ctvae_tpu/utils/watchdog.py for the production fallback).

    python scripts/soak_flash.py --steps 12000 --log /tmp/soak.log
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--tail-batch", type=int, default=96)
    ap.add_argument("--tail-every", type=int, default=100)
    ap.add_argument("--fetch-every", type=int, default=10)
    ap.add_argument("--log-every", type=int, default=250)
    ap.add_argument("--hang-timeout", type=float, default=240.0)
    ap.add_argument("--log", default="/tmp/soak_flash.log")
    ap.add_argument("--mode", default="causal")
    args = ap.parse_args()

    logf = open(args.log, "a", buffering=1)

    def log(obj):
        logf.write(json.dumps(obj) + "\n")

    log({"event": "start", "ts": time.time(),
         "flash_env": os.environ.get("CTVAE_FLASH_GAT", "auto"),
         "args": vars(args)})

    import jax
    import jax.numpy as jnp
    import optax

    from ctvae_tpu.models import vae_models
    from ctvae_tpu.training.state import create_train_state, make_train_step
    from ctvae_tpu.utils.watchdog import watchdog_fetch, StepHangError

    IMG = 64
    model = vae_models["CTMCQVAE"](
        in_channels=3, embedding_dim=128, action_dim=12,
        hidden_dims=(64, 128, 256), num_embeddings=64, img_size=IMG,
        codebooks=1, beta=0.1, gamma=1.5, c_alpha=0.01, c_beta=0.4,
        c_delta=0.01, c_epsilon=0.1, noise="off", dtype=jnp.bfloat16)

    def make_batch(b, seed):
        rng = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "image": jax.random.uniform(k1, (b, IMG, IMG, 3), jnp.float32),
            "input_y": jax.random.uniform(k2, (b, IMG, IMG, 3),
                                          jnp.float32),
            "action": jax.nn.one_hot(
                jax.random.randint(k3, (b,), 0, 12), 12),
        }

    txs = [optax.adam(5e-4)]
    batch_main = make_batch(args.batch, 0)
    batch_tail = make_batch(args.tail_batch, 1)
    state = create_train_state(
        model, jax.random.PRNGKey(0), batch_main, txs,
        fwd_kwargs_keys=("input_y", "action", "mode"))
    fwd_keys = ("input_y", "action") if args.mode != "base" else ()
    step = jax.jit(make_train_step(model, txs, M_N=0.00025,
                                   fwd_kwargs_keys=fwd_keys,
                                   static_fwd_kwargs={"mode": args.mode}),
                   donate_argnums=0)
    t0 = time.time()
    c_main = step.lower(state, batch_main).compile()
    c_tail = step.lower(state, batch_tail).compile()
    log({"event": "compiled", "sec": round(time.time() - t0, 1)})

    state, metrics = c_main(state, batch_main)
    loss = watchdog_fetch(metrics["loss"], args.hang_timeout)
    t_start = time.time()
    t_win = t_start
    try:
        for i in range(args.steps):
            if args.tail_every and (i + 1) % args.tail_every == 0:
                state, metrics = c_tail(state, batch_tail)
            else:
                state, metrics = c_main(state, batch_main)
            if (i + 1) % args.fetch_every == 0:
                loss = watchdog_fetch(metrics["loss"], args.hang_timeout,
                                      context={"step": i + 1})
                if loss != loss:
                    log({"event": "nan", "step": i + 1})
                    sys.exit(4)
            if (i + 1) % args.log_every == 0:
                now = time.time()
                log({"event": "progress", "step": i + 1,
                     "loss": round(loss, 4),
                     "ms_per_step": round((now - t_win) * 1e3
                                          / args.log_every, 2),
                     "elapsed_s": round(now - t_start, 1)})
                t_win = now
    except StepHangError as e:
        log({"event": "hang", "detail": str(e), "ts": time.time()})
        os._exit(3)
    log({"event": "done", "steps": args.steps,
         "total_s": round(time.time() - t_start, 1),
         "final_loss": round(loss, 4)})


if __name__ == "__main__":
    main()
