"""Model export for serving — self-contained StableHLO artifacts.

The reference has no deployment story: "inference" means re-instantiating
the Python model in a notebook (/root/reference/apply_action.ipynb cell 1)
and calling it eagerly. This module gives the TPU framework a real serving
path built on ``jax.export``:

* a trained model's inference entry points are traced once with the
  checkpoint weights **baked into the module as constants**, so a serving
  host needs no model code, no Flax, no checkpoint — only
  ``jax.export.deserialize(blob).call(...)``;
* artifacts are lowered for both ``cpu`` and ``tpu`` by default, so the
  same file serves on a TPU VM and in a CPU canary;
* the batch dimension can be exported symbolically (shape polymorphism),
  so one artifact serves any batch size.

Every exported function takes a single uint32 PRNG key as its first
argument (stochastic paths — Gumbel samplers, prior sampling — derive
their named streams from it); deterministic paths ignore it, which keeps
one calling convention across the whole zoo.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

from ..models.base import RNG_STREAMS

Array = jax.Array

MANIFEST_NAME = "manifest.json"

#: serving entry points; availability depends on the model family.
INFERENCE_FNS = ("reconstruct", "encode", "sample", "apply_action",
                 "classify_action")


def _stream_rngs(key: Array) -> Dict[str, Array]:
    return {s: jax.random.fold_in(key, i)
            for i, s in enumerate(RNG_STREAMS)}


def _is_ct(model) -> bool:
    return hasattr(model, "forward_causal")


def _needs_labels(model) -> bool:
    # ConditionalVAE reconstructs through a label embedding channel.
    return type(model).__name__ == "ConditionalVAE"


def make_inference_fn(model, variables, name: str, *,
                      num_samples: int = 64) -> Callable:
    """Build the pure inference callable for one entry point.

    Signature is positional-only arrays, first arg always a PRNG key:

    * ``reconstruct(key, x)`` (``(key, x, labels)`` for ConditionalVAE) —
      the reference's ``generate`` (x -> recons); CT models run the
      ``base``-mode identity transition.
    * ``encode(key, x)`` — the representation the disentanglement metrics
      use (first encoder output, flattened per sample).
    * ``sample(key)`` — ``num_samples`` ancestral samples from the prior
      (models without a usable prior don't export this, matching the
      reference's raised Warning, vq_vae.py:213-216).
    * ``apply_action(key, x, input_y, action)`` — CT only: masked causal
      intervention on x (action-mode forward, returns images).
    * ``classify_action(key, x, input_y)`` — CT only: softmin action
      probabilities over all actions (causal-mode forward).
    """
    is_ct = _is_ct(model)

    if name == "reconstruct":
        if is_ct:
            def fn(key, x):
                return model.apply(variables, x, mode="base", train=False,
                                   rngs=_stream_rngs(key))["recons"]
        elif _needs_labels(model):
            def fn(key, x, labels):
                return model.apply(variables, x, labels=labels, train=False,
                                   rngs=_stream_rngs(key))["recons"]
        else:
            def fn(key, x):
                return model.apply(variables, x, train=False,
                                   rngs=_stream_rngs(key))["recons"]
        return fn

    if name == "encode":
        def _unwrap(out):
            # LVAE returns a list of (mu, log_var) rung tuples — unwrap
            # to the first array like the metrics repr_fn does.
            z = out[0]
            while isinstance(z, (tuple, list)):
                z = z[0]
            return z.reshape(z.shape[0], -1)

        if _needs_labels(model):
            # ConditionalVAE's plain encode expects the label-embedded
            # 4-channel input; serve the raw-image entry point instead.
            def fn(key, x, labels):
                out = model.apply(variables, x, labels, train=False,
                                  method=model.encode_labeled,
                                  rngs=_stream_rngs(key))
                return _unwrap(out)
        else:
            def fn(key, x):
                # rngs are required by stochastic encoders (HVAE draws
                # its z2 sample inside encode).
                out = model.apply(variables, x, train=False,
                                  method=model.encode,
                                  rngs=_stream_rngs(key))
                return _unwrap(out)
        return fn

    if name == "sample":
        if _needs_labels(model):
            def fn(key, labels):
                return model.apply(variables, num_samples, labels=labels,
                                   train=False, rngs=_stream_rngs(key),
                                   method=model.sample)
        else:
            def fn(key):
                return model.apply(variables, num_samples, train=False,
                                   rngs=_stream_rngs(key),
                                   method=model.sample)
        return fn

    if name == "apply_action":
        if not is_ct:
            raise ValueError("apply_action is a CT-model entry point")

        def fn(key, x, input_y, action):
            return model.apply(variables, x, input_y=input_y, action=action,
                               mode="action", train=False,
                               rngs=_stream_rngs(key))["recons"]
        return fn

    if name == "classify_action":
        if not is_ct:
            raise ValueError("classify_action is a CT-model entry point")

        def fn(key, x, input_y):
            # the causal forward also computes accuracy *metrics* against
            # the true action; serving has no ground truth, so feed a
            # dummy and return only the probability vector.
            dummy = jnp.zeros((x.shape[0], model.action_dim), x.dtype)
            return model.apply(variables, x, input_y=input_y, action=dummy,
                               mode="causal", train=False,
                               rngs=_stream_rngs(key))["recons"]
        return fn

    raise ValueError(f"unknown inference fn {name!r}; "
                     f"choose from {INFERENCE_FNS}")


def available_fns(model) -> Tuple[str, ...]:
    """Entry points this model family actually supports."""
    from ..models.base import BaseVAE
    fns = ["reconstruct", "encode"]
    # Models with a usable prior override BaseVAE.sample; the base method
    # raises NotImplementedError (same contract the trainer relies on).
    if type(model).sample is not BaseVAE.sample:
        fns.append("sample")
    if _is_ct(model):
        fns += ["apply_action", "classify_action"]
    return tuple(fns)


def _polymorphic_batch(args: Sequence[Array]) -> Tuple:
    """Replace the leading dim of every array arg after the key with one
    shared symbolic batch size ``b``."""
    (b,) = jexport.symbolic_shape("b")
    out = [args[0]]
    for a in args[1:]:
        out.append(jax.ShapeDtypeStruct((b,) + tuple(a.shape[1:]), a.dtype))
    return tuple(out)


def export_fn(fn: Callable, example_args: Sequence[Array], *,
              platforms: Sequence[str] = ("cpu", "tpu"),
              poly_batch: bool = False,
              mesh=None, data_axis: str = "data") -> jexport.Exported:
    """Trace + lower ``fn`` at ``example_args`` for ``platforms``.

    With ``mesh``, the artifact is exported SPMD over the mesh for
    pod-scale serving: every array argument after the key is sharded on
    its batch (leading) dimension along ``data_axis``, the key is
    replicated, and the deserialized module runs on any same-size device
    set (``Exported.nr_devices`` is recorded in the manifest). XLA
    inserts the collectives — same recipe as the training step.
    """
    import os

    from jax.sharding import NamedSharding, PartitionSpec

    args = tuple(jnp.asarray(a) for a in example_args)
    if mesh is not None:
        if poly_batch:
            raise ValueError("poly_batch and mesh are mutually exclusive "
                             "(a sharded batch dim must be concrete)")
        rep = NamedSharding(mesh, PartitionSpec())
        in_sh = (rep,) + tuple(
            NamedSharding(mesh,
                          PartitionSpec(data_axis, *([None] * (a.ndim - 1))))
            for a in args[1:])
        jf = jax.jit(fn, in_shardings=in_sh)
    else:
        jf = jax.jit(fn)
    if poly_batch:
        args = _polymorphic_batch(args)
    # One trace serves every platform in the artifact, so the trace must
    # stay backend-portable: force the XLA attention path — a
    # pallas_call baked in by CTVAE_FLASH_GAT on a TPU host would not
    # lower for the artifact's cpu platform (and serving is
    # inference-only, where the kernel's backward win is irrelevant).
    # Thread-local scope, NOT an os.environ mutation: a train step
    # traced concurrently on another thread keeps its own routing.
    from ..ops.gat import force_xla_scope
    with force_xla_scope():
        return jexport.export(jf, platforms=tuple(platforms))(*args)


def save_artifact(out_dir: str, exported: Dict[str, jexport.Exported],
                  extra_manifest: Optional[dict] = None) -> str:
    """Write one ``<name>.shlo`` per entry point plus a JSON manifest."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = {"jax_version": jax.__version__, "functions": {}}
    manifest.update(extra_manifest or {})
    for name, exp in exported.items():
        path = os.path.join(out_dir, f"{name}.shlo")
        with open(path, "wb") as f:
            f.write(bytes(exp.serialize()))
        manifest["functions"][name] = {
            "file": f"{name}.shlo",
            "platforms": list(exp.platforms),
            "nr_devices": exp.nr_devices,
            "in_avals": [str(a) for a in exp.in_avals],
            "out_avals": [str(a) for a in exp.out_avals],
        }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return out_dir


def load_artifact(art_dir: str) -> Tuple[Dict[str, Callable], dict]:
    """Load a saved artifact: name -> callable (jitted ``.call``) plus the
    manifest. Requires only jax — no model code, no checkpoint."""
    with open(os.path.join(art_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    fns = {}
    for name, meta in manifest["functions"].items():
        with open(os.path.join(art_dir, meta["file"]), "rb") as f:
            exp = jexport.deserialize(bytearray(f.read()))
        fns[name] = jax.jit(exp.call)
    return fns, manifest
