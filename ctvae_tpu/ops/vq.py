"""Vector-quantization codebook search — Pallas TPU kernel + XLA fallback.

The hot op of the VQ/MCQ/CT family (reference
/root/reference/models/mcq_vae.py:26-39): for each latent vector, find the
L2-nearest codebook entry,

    inds = argmin_k ||x_n||^2 + ||e_k||^2 - 2 x_n . e_k

The Pallas kernel tiles the [N, D] latents over the grid, keeps the whole
codebook resident in VMEM (K x D is small: 512 x 64 fp32 = 128 KiB), runs
the distance matmul on the MXU in one shot per tile and reduces the argmin
on the VPU — the [N, K] distance matrix never touches HBM. On non-TPU
backends ``l2_argmin`` falls back to the identical XLA formulation.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


from .common import upcast32  # noqa: E402  (single shared definition)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TILE_N = 1024  # per-step latent rows; 1024 int32 inds = one (8, 128) tile


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def l2_argmin_xla(flat: Array, codebook: Array) -> Array:
    """[N, D] x [K, D] -> int32 [N]: index of nearest codebook row."""
    flat = upcast32(flat)
    codebook = upcast32(codebook)
    dist = (jnp.sum(flat ** 2, axis=1, keepdims=True)
            + jnp.sum(codebook ** 2, axis=1)
            - 2.0 * flat @ codebook.T)
    return jnp.argmin(dist, axis=1).astype(jnp.int32)


def _vq_kernel(x_ref, cb_ref, out_ref):
    """One grid step: distances for a TILE_N x K block + row argmin.

    ||x||^2 is constant per row and does not affect the argmin, so only
    the cross term and codebook norms are computed.
    """
    x = upcast32(x_ref[:])                      # [TN, D]
    cb = upcast32(cb_ref[:])                    # [K, D]
    # keepdims + transpose, NOT [K] + [None, :]: a 1-D intermediate in a
    # gridded kernel crashes this toolchain's Mosaic remote-compile
    # (HTTP 500; bisected 2026-08-20 — the all-2D form compiles and
    # matches).
    cb_norm = jnp.sum(cb * cb, axis=1, keepdims=True)     # [K, 1]
    scores = cb_norm.T - 2.0 * jax.lax.dot_general(
        x, cb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [TN, K]
    # argmin via min + first-matching-index select, all-2D with keepdims
    # (1-D intermediates force giant relayout scratch in Mosaic).
    tn, k = scores.shape
    min_val = jnp.min(scores, axis=1, keepdims=True)          # [TN, 1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tn, k), 1)
    masked = jnp.where(scores == min_val, col_ids, k)
    out_ref[:] = jnp.min(masked, axis=1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def l2_argmin_pallas(flat: Array, codebook: Array,
                     interpret: bool = False) -> Array:
    n, d = flat.shape
    k, _ = codebook.shape
    n_pad = _round_up(max(n, 8), _TILE_N)
    k_pad = _round_up(k, 128)
    d_pad = _round_up(d, 128)
    x = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(flat)
    # Padded codebook rows are pushed to +inf distance via a huge norm.
    cb = jnp.full((k_pad, d_pad), 0.0, jnp.float32).at[:k, :d].set(codebook)
    if k_pad > k:
        cb = cb.at[k:, 0].set(1e9)

    grid = (n_pad // _TILE_N,)
    inds = pl.pallas_call(
        _vq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_N, d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, d_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # [TN, 1] index column per step (last dim equals the full array
        # dim, which is always a legal block).
        out_specs=pl.BlockSpec((_TILE_N, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=interpret,
    )(x, cb)
    return inds.reshape(n_pad)[:n]


# The Pallas kernel is opt-in (CTVAE_PALLAS_VQ=1). History: the round-2
# toolchain hung on ANY pallas_call through this tunnel; that is fixed
# (2026-08-20), and the one remaining Mosaic bug — 1-D intermediates in
# a gridded kernel crash the remote compile helper — is worked around
# above (keepdims+transpose codebook norms). The kernel now runs on the
# chip and matches the XLA formulation EXACTLY at every tested
# (N, D, K) shape, timing at par (both are tunnel-RTT-dominated at
# these sizes: ~1-2 ms measured, real device time tens of us). The XLA
# formulation stays the default because it compiles to the same MXU
# matmul with the argmin fused into the epilogue and is not a
# measurable fraction of any model's step time.
_USE_PALLAS_VQ = os.environ.get("CTVAE_PALLAS_VQ", "0") == "1"


def l2_argmin(flat: Array, codebook: Array) -> Array:
    """Dispatch: Pallas on TPU (when enabled), XLA elsewhere (identical
    results)."""
    if _USE_PALLAS_VQ and jax.default_backend() == "tpu":
        return l2_argmin_pallas(flat, codebook)
    return l2_argmin_xla(flat, codebook)
