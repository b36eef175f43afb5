"""Pairwise edge scoring for causal graph discovery.

The reference scores every ordered pair of causal variables with a 2-layer
MLP on the concatenated pair, either materializing the full
[B, S*S, 2N] tensor ("comp", /root/reference/models/ct_mcq_vae.py:140-154)
or looping row by row ("mem", :156-174).

TPU-native factorization: for ``adj[s,t] = sigmoid(w2 . leaky(W [x_s||x_t] + b1) + b2)``
the first layer splits as ``W [x_s||x_t] = Wl x_s + Wr x_t``, so the two
[B, S, Hdim] projections are computed ONCE on the MXU and only the cheap
broadcast-add + LeakyReLU + contraction runs per pair. Peak memory drops
from O(S^2 * 2N) to O(S_block * S * Hdim) via ``block_rows`` (the
single-knob replacement for the reference's comp/mem switch).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..parallel.mesh import shard_dim

Array = jax.Array


# Above this size the [B, S, S, H] pre-activation switches from the MXU
# einsum (which materializes it in HBM — cheap when it fits: traffic
# ~2x its bytes at 820 GB/s, contraction effectively free) to a fused
# VPU multiply+sum under jax.checkpoint (never materialized — slower
# per element, but the only way the 12-action causal virtual batch fits
# in HBM at all). Crossover measured in scripts/bench_ct.py: at batch
# 128 / H=800 (839 MB) the einsum wins by ~5 ms/step; at the causal
# mode's ~10+ GB the einsum OOMs.
_FUSED_PAIRWISE_BYTES = 2 << 30


def pairwise_mlp_scores(x_left: Array, x_right: Array, w2: Array, b2: Array,
                        b1: Array, negative_slope: float = 0.01,
                        block_rows: Optional[int] = None,
                        fused: Optional[bool] = None,
                        seq_axis: Optional[str] = None) -> Array:
    """Scores for all ordered pairs.

    x_left:  [B, S, H] = X @ Wl   (row / first element of the pair)
    x_right: [B, S, H] = X @ Wr   (column / second element)
    w2: [H] or [B, H] (broadcast to [B, H]); b2: [] or [B]; b1: [..., H]
    fused: None = auto by pre-activation size (see _FUSED_PAIRWISE_BYTES)
    seq_axis: mesh axis to shard the COLUMN (second-element) node axis
        over — sequence parallelism splitting the O(B S S H) domain
        across chips (parallel/mesh.py shard_dim; no-op outside a mesh,
        and skipped on the ``block_rows`` path, which bounds the
        workspace a different way).
    Returns sigmoid(leaky(x_left[s] + x_right[t] + b1) @ w2 + b2): [B, S, S].
    """
    B, S, H = x_left.shape
    if fused is None:
        fused = (B * S * S * H * x_left.dtype.itemsize
                 > _FUSED_PAIRWISE_BYTES)
    w2b = jnp.broadcast_to(w2, (B, H)) if w2.ndim <= 2 else w2

    def rows(chunk):  # chunk: [B, C, H] of left rows
        pre = chunk[:, :, None, :] + x_right[:, None, :, :] + b1[..., None, None, :]
        act = jax.nn.leaky_relu(pre, negative_slope)
        if fused:
            return jax.nn.sigmoid(
                jnp.sum(act * w2b[..., None, None, :], axis=-1)
                + b2[..., None, None])
        return jax.nn.sigmoid(
            jnp.einsum("bcth,bh->bct", act, w2b) + b2[..., None, None])

    if fused:
        rows = jax.checkpoint(rows)

    if block_rows is None or block_rows >= S:
        return shard_dim(rows(x_left), 2, seq_axis)
    nb = -(-S // block_rows)
    pad = nb * block_rows - S
    xl = jnp.pad(x_left, ((0, 0), (0, pad), (0, 0)))
    chunks = xl.reshape(B, nb, block_rows, H).transpose(1, 0, 2, 3)
    out = jax.lax.map(rows, chunks)                      # [nb, B, C, S]
    out = out.transpose(1, 0, 2, 3).reshape(B, nb * block_rows, S)
    return out[:, :S]
