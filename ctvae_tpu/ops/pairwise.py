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

Array = jax.Array


def pairwise_mlp_scores(x_left: Array, x_right: Array, w2: Array, b2: Array,
                        b1: Array, negative_slope: float = 0.01,
                        block_rows: Optional[int] = None) -> Array:
    """Scores for all ordered pairs.

    x_left:  [B, S, H] = X @ Wl   (row / first element of the pair)
    x_right: [B, S, H] = X @ Wr   (column / second element)
    w2: [..., H], b2: [...] broadcastable over [B, S] rows; b1: [..., H]
    Returns sigmoid(leaky(x_left[s] + x_right[t] + b1) @ w2 + b2): [B, S, S].
    """
    B, S, H = x_left.shape
    w2b = jnp.broadcast_to(w2, (B, H)) if w2.ndim <= 2 else w2

    @jax.checkpoint
    def rows(chunk):  # chunk: [B, C, H] of left rows
        pre = chunk[:, :, None, :] + x_right[:, None, :, :] + b1[..., None, None, :]
        act = jax.nn.leaky_relu(pre, negative_slope)
        # fused multiply + VPU sum (not an einsum): the [B, C, S, H]
        # pre-activation never reaches HBM — an MXU contraction would
        # force its materialization, and at H=800 the op is bandwidth-
        # bound, not FLOP-bound (same finding as ops/gat.py fused_logits,
        # measured in scripts/bench_ct.py). jax.checkpoint recomputes it
        # in backward instead of saving it.
        return jax.nn.sigmoid(
            jnp.sum(act * w2b[..., None, None, :], axis=-1)
            + b2[..., None, None])

    if block_rows is None or block_rows >= S:
        return rows(x_left)
    nb = -(-S // block_rows)
    pad = nb * block_rows - S
    xl = jnp.pad(x_left, ((0, 0), (0, pad), (0, 0)))
    chunks = xl.reshape(B, nb, block_rows, H).transpose(1, 0, 2, 3)
    out = jax.lax.map(rows, chunks)                      # [nb, B, C, S]
    out = out.transpose(1, 0, 2, 3).reshape(B, nb * block_rows, S)
    return out[:, :S]
