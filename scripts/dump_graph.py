#!/usr/bin/env python
"""Dump the computation graph of a model's train step.

The reference renders the CT-VAE autograd graph with torchviz for loss
debugging (/root/reference/utils/build_comp_graph.py:8-25). The JAX
equivalents are strictly more informative: this tool writes, for a given
config and batch mode,

* ``<out>/<name>_<mode>.jaxpr.txt``   — the traced jaxpr (autograd graph
  included: the dump covers the full value_and_grad train step),
* ``<out>/<name>_<mode>.hlo.txt``     — optimized HLO after XLA passes,
* ``<out>/<name>_<mode>.cost.json``   — FLOPs / bytes-accessed estimates
  from the compiled executable, the numbers to sanity-check any
  throughput claim against.

Usage: ``python scripts/dump_graph.py -c configs/synthetic_ct.yaml -m action``
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", "-c", default="configs/synthetic_ct.yaml")
    parser.add_argument("--mode", "-m", default="base",
                        choices=["base", "action", "causal"])
    parser.add_argument("--out", "-o", default="graphs/")
    parser.add_argument("--batch-size", type=int, default=8)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from ctvae_tpu.models import build_model
    from ctvae_tpu.training import create_train_state, make_train_step
    from ctvae_tpu.training.experiment import FWD_KEYS, _has_modes

    with open(args.config) as f:
        config = yaml.safe_load(f)
    model = build_model(config["model_params"])
    name = config["model_params"]["name"]
    img = int(config["model_params"].get("img_size", 64))
    ch = int(config["model_params"].get("in_channels", 3))
    B = args.batch_size

    rng = jax.random.PRNGKey(0)
    batch = {"image": jax.random.uniform(rng, (B, img, img, ch))}
    if _has_modes(model) and args.mode != "base":
        batch["input_y"] = jax.random.uniform(rng, (B, img, img, ch))
        batch["action"] = jax.nn.one_hot(
            jax.random.randint(rng, (B,), 0, model.action_dim),
            model.action_dim)

    txs = [optax.adam(1e-3)]
    state = create_train_state(model, rng, batch, txs,
                               fwd_kwargs_keys=FWD_KEYS)
    static = {"mode": args.mode} if _has_modes(model) else None
    step = make_train_step(model, txs, M_N=0.00025,
                           fwd_kwargs_keys=FWD_KEYS,
                           static_fwd_kwargs=static)

    os.makedirs(args.out, exist_ok=True)
    stem = os.path.join(args.out, f"{name}_{args.mode}")

    jaxpr = jax.make_jaxpr(step)(state, batch)
    with open(stem + ".jaxpr.txt", "w") as f:
        f.write(jaxpr.pretty_print())
    print(f"jaxpr  -> {stem}.jaxpr.txt ({len(jaxpr.jaxpr.eqns)} top-level eqns)")

    lowered = jax.jit(step).lower(state, batch)
    compiled = lowered.compile()
    with open(stem + ".hlo.txt", "w") as f:
        f.write(compiled.as_text())
    print(f"hlo    -> {stem}.hlo.txt")

    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, list) else cost
    summary = {k: float(v) for k, v in dict(cost or {}).items()
               if isinstance(v, (int, float))}
    with open(stem + ".cost.json", "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)
    flops = summary.get("flops")
    print(f"cost   -> {stem}.cost.json"
          + (f" (step flops ~{flops:.3e})" if flops else ""))


if __name__ == "__main__":
    main()
