"""On-chip A/B of the pairwise edge-score op: XLA one-walk custom-VJP
vs the flash-fused Pallas kernel (ops/pairwise_flash.py), at the CT
causal headline shapes (virtual batch 192, 64 sites, hidden 800, bf16
per-sample params), fwd and fwd+bwd.

Run: python scripts/bench_pairwise.py [batch] (needs the real chip)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from ctvae_tpu.ops.pairwise import fused_pairwise_scores
from ctvae_tpu.ops.pairwise_flash import flash_pairwise

B = int(sys.argv[1]) if len(sys.argv) > 1 else 192
S, HD = 64, 800
DT = jnp.bfloat16


def timeit(fn, *args, steps=30):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf.astype(jnp.float32)))
    probe = jax.device_put(jnp.float32(0)) + 1
    probe.block_until_ready()
    t0 = time.perf_counter()
    _ = float(probe)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf.astype(jnp.float32)))
    return (time.perf_counter() - t0 - rtt) / steps


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    xl = jax.random.normal(ks[0], (B, S, HD), DT)
    xr = jax.random.normal(ks[1], (B, S, HD), DT)
    w2 = jax.random.normal(ks[2], (B, HD), DT)
    b1 = jax.random.normal(ks[3], (B, HD), DT)
    b2 = jax.random.normal(ks[4], (B,), DT)
    args = (xl, xr, w2, b1, b2)

    def loss(op):
        def f(*a):
            return jnp.sum(op(*a).astype(jnp.float32))
        return f

    xla_op = lambda *a: fused_pairwise_scores(*a, 0.01)          # noqa
    fl_op = lambda *a: flash_pairwise(*a, 0.01, False)           # noqa

    for name, op in (("xla-onewalk", xla_op), ("flash", fl_op)):
        fwd = jax.jit(op)
        fb = jax.jit(jax.grad(loss(op), argnums=(0, 1, 2, 3, 4)))
        tf = timeit(fwd, *args) * 1e3
        tb = timeit(fb, *args) * 1e3
        print(f"{name:12s} fwd {tf:8.3f} ms   fwd+bwd {tb:8.3f} ms",
              flush=True)

    o1, o2 = jax.jit(xla_op)(*args), jax.jit(fl_op)(*args)
    d = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                              - o2.astype(jnp.float32))))
    g1 = jax.jit(jax.grad(loss(xla_op), argnums=(0, 1, 2, 3, 4)))(*args)
    g2 = jax.jit(jax.grad(loss(fl_op), argnums=(0, 1, 2, 3, 4)))(*args)
    gd = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                   - b.astype(jnp.float32))))
             for a, b in zip(g1, g2))
    print(f"       max|out diff| {d:.3e}  max|grad diff| {gd:.3e}")


if __name__ == "__main__":
    main()
