"""On-chip A/B of the full dense-GATv2 attention: XLA fused+checkpoint
path vs the flash-fused Pallas kernel (ops/gat_flash.py), at the CT
causal-mode headline shapes (virtual batch 192 = 16 x 12 hypotheses,
65 nodes, 13 heads, width 100, bf16), fwd and fwd+bwd.

Run: python scripts/bench_gat_flash.py [batch] (needs the real chip)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from ctvae_tpu.ops.gat import DenseGATv2Layer

B = int(sys.argv[1]) if len(sys.argv) > 1 else 192
T, H, F_IN, F_OUT = 65, 13, 164, 100


def timeit(fn, *args, steps=30):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf))
    probe = jax.device_put(jnp.float32(0)) + 1
    probe.block_until_ready()
    t0 = time.perf_counter()
    _ = float(probe)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf))
    return (time.perf_counter() - t0 - rtt) / steps


def main():
    layer = DenseGATv2Layer(F_OUT, heads=H, dtype=jnp.bfloat16)
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k[0], (B, T, F_IN), jnp.float32)
    adj = jnp.where(jax.random.uniform(k[1], (B, T, T)) > 0.6,
                    1.0, 0.0).astype(jnp.float32)
    variables = layer.init(jax.random.PRNGKey(1), x, adj)

    def fwd(params, x, adj):
        return layer.apply({"params": params}, x, adj)

    def loss(params, x, adj):
        return jnp.sum(fwd(params, x, adj).astype(jnp.float32) ** 2)

    variants = (("xla-ckpt", {"CTVAE_FLASH_GAT": "0", "CTVAE_GAT_ONEWALK": "0"}),
                ("onewalk", {"CTVAE_FLASH_GAT": "0", "CTVAE_GAT_ONEWALK": "1"}),
                ("flash", {"CTVAE_FLASH_GAT": "1", "CTVAE_GAT_ONEWALK": "0"}))
    for name, envs in variants:
        os.environ.update(envs)
        try:
            f = jax.jit(fwd)
            dt = timeit(f, variables["params"], x, adj)
            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
            dt2 = timeit(g, variables["params"], x, adj)
            print(f"{name:6s} fwd {dt*1e3:8.3f} ms   fwd+bwd {dt2*1e3:8.3f} ms",
                  flush=True)
            if name == "xla-ckpt":
                ref_out, ref_g = f(variables["params"], x, adj), \
                    g(variables["params"], x, adj)
            else:
                got_out = f(variables["params"], x, adj)
                err = float(jnp.max(jnp.abs(
                    ref_out.astype(jnp.float32) - got_out.astype(jnp.float32))))
                gerr = max(float(jnp.max(jnp.abs(
                    a.astype(jnp.float32) - b.astype(jnp.float32))))
                    for a, b in zip(jax.tree_util.tree_leaves(ref_g),
                                    jax.tree_util.tree_leaves(
                                        g(variables["params"], x, adj))))
                print(f"       max|out diff| {err:.3e}  max|grad diff| {gerr:.3e}")
        except Exception as e:  # noqa: BLE001
            print(f"{name} failed: {type(e).__name__}: {str(e)[:400]}")


if __name__ == "__main__":
    main()
