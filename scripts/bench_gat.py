"""Micro-benchmark of the dense GATv2 logits formulation on a real TPU.

The CT action step runs at ~70% of its roofline with the GATv2
pre-activation traffic dominating (PARITY.md). The logits need

    e[b,s,t,h] = sum_f att[h,f] * leaky_relu(xl[b,s,h,f] + xr[b,t,h,f]
                                             + adj[b,s,t] * we[h,f])

whose natural einsum formulation materializes the [B,S,T,H,F]
pre-activation in HBM (and saves it for backward). This script times,
fwd+bwd, on the reference headline CT shapes:

  v1  einsum (current ops/gat.py code path)
  v2  fused jnp.sum reduction under jax.checkpoint (recompute in bwd)
  v3  Pallas kernel, pre-activation kept in VMEM (fwd only unless
      CTVAE_PALLAS_GAT custom-VJP is available)

Run: python scripts/bench_gat.py  (needs the real chip)
"""

import functools
import time

import jax
import jax.numpy as jnp
from flax import linen as nn

# headline CT-MCQ-VAE shapes (configs/ct_mcq_vae.yaml): 8x8 latents
# + action node, heads = 1 + action_dim, layer-1 width 100
B, S, H, F_IN, F_OUT = 16, 65, 13, 64, 100
NS = 0.2
T = S


def timeit(fn, *args, steps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    # force a host fetch — block_until_ready via the tunnel can lie
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf))
    t0 = time.perf_counter()
    _ = float(jnp.sum(leaf))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(leaf))
    return (time.perf_counter() - t0 - rtt) / steps


def logits_einsum(xl, xr, adj, we, att):
    pre = (xl[:, :, None, :, :] + xr[:, None, :, :, :]
           + adj[:, :, :, None, None] * we)
    return jnp.einsum("bsthf,hf->bsth", nn.leaky_relu(pre, NS), att)


@jax.checkpoint
def logits_fused(xl, xr, adj, we, att):
    pre = (xl[:, :, None, :, :] + xr[:, None, :, :, :]
           + adj[:, :, :, None, None] * we)
    return jnp.sum(nn.leaky_relu(pre, NS) * att, axis=-1)


def make_loss(logits_fn):
    @jax.jit
    def loss(xl, xr, adj, we, att):
        return jnp.sum(logits_fn(xl, xr, adj, we, att) ** 2)
    return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))


def pallas_logits():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(xl_ref, xr_ref, adj_ref, we_ref, att_ref, out_ref):
        xl = xl_ref[0, 0]                           # [S, F]
        xr = xr_ref[0, 0]                           # [T, F]
        adj = adj_ref[0]                            # [S, T]
        we = we_ref[0, 0]                           # [F]
        att = att_ref[0, 0]                         # [F]
        pre = (xl[:, None, :] + xr[None, :, :]
               + adj[:, :, None] * we[None, None, :])   # [S, T, F]
        lr = jnp.where(pre >= 0, pre, NS * pre)
        out_ref[0] = jnp.sum(lr * att[None, None, :], axis=-1)

    @jax.jit
    def run(xl, xr, adj, we, att):
        # xl/xr [B,S,H,F] -> [B,H,S,F]; grid over (B, H)
        xl = xl.transpose(0, 2, 1, 3)
        xr = xr.transpose(0, 2, 1, 3)
        Bn, Hn, Sn, Fn = xl.shape
        return pl.pallas_call(
            kernel,
            grid=(Bn, Hn),
            in_specs=[
                pl.BlockSpec((1, 1, Sn, Fn), lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Sn, Fn), lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Sn, Sn), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Fn), lambda b, h: (h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, Fn), lambda b, h: (h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Sn, Sn), lambda b, h: (b * Hn + h, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bn * Hn, Sn, Sn), xl.dtype),
        )(xl, xr, adj, we[:, None, :], att[:, None, :])

    return run


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    xl = jax.random.normal(ks[0], (B, S, H, F_OUT), jnp.float32)
    xr = jax.random.normal(ks[1], (B, T, H, F_OUT), jnp.float32)
    adj = (jax.random.uniform(ks[2], (B, S, T)) > 0.5).astype(jnp.float32)
    we = jax.random.normal(ks[3], (H, F_OUT)) * 0.1
    att = jax.random.normal(ks[4], (H, F_OUT)) * 0.1

    for name, fn in [("einsum", logits_einsum), ("fused+ckpt", logits_fused)]:
        g = make_loss(fn)
        dt = timeit(g, xl, xr, adj, we, att)
        print(f"{name:12s} fwd+bwd: {dt*1e3:8.3f} ms")
        f = jax.jit(fn)
        dt = timeit(f, xl, xr, adj, we, att)
        print(f"{name:12s} fwd    : {dt*1e3:8.3f} ms")

    try:
        run = pallas_logits()
        # correctness vs einsum
        ref = logits_einsum(xl, xr, adj, we, att)
        got = run(xl, xr, adj, we, att).reshape(B, H, S, T).transpose(0, 2, 3, 1)
        err = float(jnp.max(jnp.abs(ref - got)))
        dt = timeit(run, xl, xr, adj, we, att)
        print(f"{'pallas':12s} fwd    : {dt*1e3:8.3f} ms   max|err|={err:.2e}")
    except Exception as e:  # noqa: BLE001
        print(f"pallas failed: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
