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


def parse_fusion_sources(hlo_text):
    """fusion name -> (output shape, {source_file:line ...}) from the
    optimized HLO, so the kernel table below can say WHICH model code a
    hot fusion belongs to instead of an opaque `fusion.N`."""
    import re
    out = {}
    for m in re.finditer(
            r'%(fusion[\w\.\-]*) = (.+?) fusion\(.*?calls=%?([\w\.\-]+)',
            hlo_text):
        # strip layout annotations (tuple layouts contain parentheses,
        # e.g. T(8,128)(2,1), so match the whole span then clean it)
        shape = re.sub(r'\{[^}]*\}', '', m.group(2))
        out[m.group(1)] = (shape, m.group(3))
    comp_src = {}
    for m in re.finditer(r'%?([\w\.\-]+) (?:\([^)]*\) -> [^{]+)?\{(.*?)\n\}',
                         hlo_text, re.S):
        srcs = set()
        for mm in re.finditer(r'source_file="([^"]+)" source_line=(\d+)',
                              m.group(2)):
            srcs.add(f"{mm.group(1).rsplit('/', 1)[-1]}:{mm.group(2)}")
        if srcs:
            comp_src[m.group(1)] = srcs
    return {name: (shape, sorted(comp_src.get(comp, []))[:4])
            for name, (shape, comp) in out.items()}


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
    fusion_src = parse_fusion_sources(compiled.as_text())
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
        shape, srcs = fusion_src.get(name, (None, []))
        where = f"  {shape}  [{' '.join(srcs)}]" if shape else ""
        print(f"{dur/1e3:9.3f} ms  x{count[name]:<4d} {name[:60]}{where}")


if __name__ == "__main__":
    main()
