#!/usr/bin/env python
"""Export a trained model to a self-contained serving artifact.

Usage::

    python scripts/export_model.py -c configs/ct_mcq_vae.yaml \
        --ckpt logs/CTMCQVAE/version_0/checkpoints/last --out artifacts/ct

The artifact directory holds one StableHLO blob per inference entry point
(reconstruct / encode / sample / apply_action / classify_action, as the
model family supports) with the checkpoint weights baked in, plus a JSON
manifest. Serving needs only jax::

    from ctvae_tpu.serving import load_artifact
    fns, manifest = load_artifact("artifacts/ct")
    imgs = fns["reconstruct"](jax.random.PRNGKey(0), batch)

The reference has no equivalent (its inference path is the notebook
re-building the Python model, apply_action.ipynb cell 1).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", "-c", default="configs/vae.yaml")
    parser.add_argument("--ckpt", default=None,
                        help="orbax checkpoint dir (omit to export at "
                             "random init, e.g. for pipeline smoke tests)")
    parser.add_argument("--out", required=True, help="artifact directory")
    parser.add_argument("--fns", default=None,
                        help="comma-separated entry points (default: all "
                             "the model family supports)")
    parser.add_argument("--batch", type=int, default=8,
                        help="example batch size used for tracing")
    parser.add_argument("--poly-batch", action="store_true",
                        help="export with a symbolic batch dimension (one "
                             "artifact serves any batch size)")
    parser.add_argument("--platforms", default="cpu,tpu")
    parser.add_argument("--num-samples", type=int, default=64,
                        help="static sample count for the `sample` export")
    args = parser.parse_args()

    with open(args.config) as f:
        config = yaml.safe_load(f)

    import jax
    import jax.numpy as jnp

    from ctvae_tpu.utils.platform import apply_platform_overrides
    apply_platform_overrides()

    from ctvae_tpu.data import VAEDataset
    from ctvae_tpu.models import build_model
    from ctvae_tpu.models.base import RNG_STREAMS
    from ctvae_tpu.serving import (available_fns, export_fn,
                                   load_artifact, make_inference_fn,
                                   save_artifact)
    from ctvae_tpu.utils.checkpoint import load_weights_only

    model = build_model(config["model_params"])
    data = VAEDataset(**config["data_params"])
    data.setup()
    # prefer an action-mode batch so transition entry points get their
    # example inputs (same seek as apply_action.py)
    batch = None
    for b in data.test_dataloader(0):
        if batch is None:
            batch = b
        if b.get("mode") == "action":
            batch = b
            break
        if "mode" not in b:       # plain dataset: every batch looks alike
            break

    B = args.batch
    x = jnp.asarray(batch["image"][:B])
    init_kwargs = {"train": False}
    if "action" in batch:
        init_kwargs.update(action=jnp.asarray(batch["action"][:B]),
                           input_y=jnp.asarray(batch["input_y"][:B]),
                           mode=batch.get("mode", "action"))
    if "labels" in batch and type(model).__name__ == "ConditionalVAE":
        init_kwargs["labels"] = jnp.asarray(batch["labels"][:B])

    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, **{s: jax.random.fold_in(rng, i + 1)
                              for i, s in enumerate(RNG_STREAMS)}}
    variables = dict(model.init(rngs, x, **init_kwargs))
    if args.ckpt:
        variables["params"] = jax.tree_util.tree_map(
            jnp.asarray, load_weights_only(args.ckpt, variables["params"]))
    else:
        print("WARNING: no --ckpt given; exporting randomly initialized "
              "weights", file=sys.stderr)

    names = (args.fns.split(",") if args.fns else available_fns(model))
    key = jax.random.PRNGKey(7)
    if "labels" in init_kwargs:
        # the sample entry point pairs each of the num_samples latents
        # with a label row — tile the example labels to that length
        lab = init_kwargs["labels"]
        reps = -(-args.num_samples // lab.shape[0])           # ceil div
        sample_labels = jnp.tile(lab, (reps, 1))[:args.num_samples]
    example_args = {
        "reconstruct": (key, x, init_kwargs["labels"])
        if "labels" in init_kwargs else (key, x),
        "encode": (key, x, init_kwargs["labels"])
        if "labels" in init_kwargs else (key, x),
        "sample": (key, sample_labels)
        if "labels" in init_kwargs else (key,),
        "apply_action": (key, x, init_kwargs.get("input_y", x),
                         init_kwargs.get("action")),
        "classify_action": (key, x, init_kwargs.get("input_y", x)),
    }

    platforms = tuple(args.platforms.split(","))
    exported, live = {}, {}
    for name in names:
        fn = make_inference_fn(model, variables, name,
                               num_samples=args.num_samples)
        ex_args = example_args[name]
        if any(a is None for a in ex_args):
            print(f"skip {name}: example batch lacks its inputs "
                  f"(need a transition dataset)", file=sys.stderr)
            continue
        exported[name] = export_fn(fn, ex_args, platforms=platforms,
                                   poly_batch=args.poly_batch
                                   and name != "sample")
        live[name] = np.asarray(fn(*ex_args))
        print(f"exported {name}: {[str(a) for a in exported[name].in_avals]}"
              f" -> {[str(a) for a in exported[name].out_avals]}")

    out = save_artifact(args.out, exported, {
        "model": config["model_params"].get("name"),
        "config": args.config, "checkpoint": args.ckpt,
        "poly_batch": bool(args.poly_batch)})

    # verify the round trip on this host before declaring success
    fns, _ = load_artifact(out)
    for name, fn in fns.items():
        got = np.asarray(fn(*example_args[name]))
        diff = float(np.max(np.abs(got - live[name])))
        print(f"verify {name}: max|artifact - live| = {diff:.3g}")
        # re-compiled module may fuse differently: float-level, not bitwise
        np.testing.assert_allclose(got, live[name], rtol=1e-4, atol=1e-5,
                                   err_msg=f"{name} round trip mismatch")
    print(f"artifact -> {out}")


if __name__ == "__main__":
    main()
