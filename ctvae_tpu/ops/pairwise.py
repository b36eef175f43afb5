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

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..parallel.mesh import shard_dim

Array = jax.Array


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_pairwise_scores(xl: Array, xr: Array, w2: Array, b1: Array,
                          b2: Array, ns: float) -> Array:
    """``sigmoid(sum_h leaky(xl_s + xr_t + b1) * w2 + b2)`` with a
    hand-written ONE-WALK backward.

    The ``jax.checkpoint`` form recomputes the [B, S, T, H] pre-activation
    once per gradient reduction (~4 separate loop fusions over the full
    domain — the same pathology ops/gat.py ``fused_gat_logits`` fixes for
    the attention logits; at the causal virtual batch this domain is
    ~1.3 GB per walk). Here the residual is the forward's own [B, S, T]
    output (free — it IS the return value), the sigmoid gradient is the
    cheap ``out * (1 - out)``, and ONE recomputation of the domain yields
    all five input gradients as multi-output-fusable reductions: 2 total
    walks (1 fwd + 1 bwd), the exact-gradient floor.

    xl [B,S,H], xr [B,T,H], w2 [H] or [B,H], b1 [H] or [B,H],
    b2 scalar or [B]. Returns [B, S, T].
    """
    pre = (xl[:, :, None, :] + xr[:, None, :, :]
           + _bh(b1))
    act = jnp.where(pre >= 0, pre, ns * pre)
    z = jnp.sum(act * _bh(w2), axis=-1) + _b(b2)
    return jax.nn.sigmoid(z)


def _bh(p: Array) -> Array:
    """[H] -> [H] (broadcasts) or [B,H] -> [B,1,1,H] against [B,S,T,H]."""
    return p[:, None, None, :] if p.ndim == 2 else p


def _b(p: Array) -> Array:
    """scalar stays scalar; [B] -> [B,1,1] against [B,S,T]."""
    return p[:, None, None] if p.ndim == 1 else p


def _fps_fwd(xl, xr, w2, b1, b2, ns):
    out = fused_pairwise_scores(xl, xr, w2, b1, b2, ns)
    return out, (xl, xr, w2, b1, b2, out)


def _fps_bwd(ns, res, d_out):
    xl, xr, w2, b1, b2, out = res
    d_z = d_out * out * (1.0 - out)                      # [B,S,T]
    pre = (xl[:, :, None, :] + xr[:, None, :, :] + _bh(b1))
    slope = jnp.where(pre >= 0, jnp.asarray(1.0, pre.dtype),
                      jnp.asarray(ns, pre.dtype))
    dpre = d_z[..., None] * _bh(w2) * slope              # [B,S,T,H]
    d_xl = jnp.sum(dpre, axis=2)                         # [B,S,H]
    d_xr = jnp.sum(dpre, axis=1)                         # [B,T,H]
    act = jnp.where(pre >= 0, pre, ns * pre)
    w_axes = (1, 2) if w2.ndim == 2 else (0, 1, 2)
    d_w2 = jnp.sum(act * d_z[..., None], axis=w_axes)
    b1_axes = (1, 2) if b1.ndim == 2 else (0, 1, 2)
    d_b1 = jnp.sum(dpre, axis=b1_axes)
    # b2 enters z additively: its grad is d_z summed over the axes it
    # broadcast across
    d_b2 = jnp.sum(d_z, axis=(1, 2)) if b2.ndim == 1 else jnp.sum(d_z)
    return d_xl, d_xr, d_w2, d_b1, d_b2


fused_pairwise_scores.defvjp(_fps_fwd, _fps_bwd)


def _onewalk_enabled() -> bool:
    """CTVAE_PAIRWISE_ONEWALK routes the fused pairwise backward through
    the one-walk custom VJP above instead of ``jax.checkpoint``
    recompute. 0 restores the checkpointed form (same values/grads)."""
    return os.environ.get("CTVAE_PAIRWISE_ONEWALK", "1") != "0"


def _use_flash_pairwise() -> bool:
    """Route the fused path through the Pallas kernel
    (ops/pairwise_flash.py): CTVAE_FLASH_PAIRWISE=1 forces it on any
    backend (CPU runs the interpreter — tests); "auto" (default) uses
    it on a TPU backend, where the single-walk schedule measures ~2.5x
    faster than the XLA one-walk fusion at the CT shapes
    (scripts/bench_pairwise.py, chip A/B 2026-08-21); 0 disables.
    Respects ops/gat.py force_xla_scope (export portability)."""
    from .gat import _in_force_xla_scope
    if _in_force_xla_scope():
        return False
    v = os.environ.get("CTVAE_FLASH_PAIRWISE", "auto")
    if v == "1":
        return True
    return v == "auto" and jax.default_backend() == "tpu"


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

    # The Pallas kernel beats BOTH XLA paths (it walks the domain once
    # per direction and never materializes it — faster than the einsum
    # even where the einsum fits in HBM: chip A/B 2026-08-21, fwd+bwd
    # 3.1 ms vs einsum 7 / one-walk 5.7 at the causal shapes), so when
    # available it takes precedence over the size-based fused/einsum
    # switch. Not under sequence parallelism (the kernel grid owns the
    # full source axis per program; SP splits the domain across chips
    # on the XLA path instead); ``block_rows`` is honored by the
    # caller's chunking below — the kernel is VMEM-bounded either way.
    use_flash = seq_axis is None and _use_flash_pairwise()
    onewalk = fused and _onewalk_enabled()

    def rows(chunk):  # chunk: [B, C, H] of left rows
        if use_flash:
            from .pairwise_flash import flash_pairwise
            return flash_pairwise(chunk, x_right, w2b,
                                  jnp.asarray(b1), jnp.asarray(b2),
                                  negative_slope,
                                  jax.default_backend() != "tpu")
        if onewalk:
            # one-walk custom-VJP backward (see fused_pairwise_scores)
            return fused_pairwise_scores(chunk, x_right, w2b,
                                         jnp.asarray(b1), jnp.asarray(b2),
                                         negative_slope)
        pre = chunk[:, :, None, :] + x_right[:, None, :, :] + b1[..., None, None, :]
        act = jax.nn.leaky_relu(pre, negative_slope)
        if fused:
            return jax.nn.sigmoid(
                jnp.sum(act * w2b[..., None, None, :], axis=-1)
                + b2[..., None, None])
        return jax.nn.sigmoid(
            jnp.einsum("bcth,bh->bct", act, w2b) + b2[..., None, None])

    if fused and not onewalk and not use_flash:
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
