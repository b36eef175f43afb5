"""Vector quantizers (single + multi-codebook).

Parity targets:
* ``VectorQuantizerMS`` — /root/reference/models/mcq_vae.py:7-74: the
  two-phase API (``compute_inds`` / ``compute_latents``) that the causal
  transition layer splices between,
* ``MultipleCodebookVectorQuantizer`` — :78-137: C codebooks sharing the
  embedding dim.

TPU-first details: NHWC latents; codebook search via the fused Pallas
kernel (``ctvae_tpu.ops.vq``); quantized vectors come from a direct
gather instead of the reference's one-hot matmul (:48-52) — identical
values, no [N, K] one-hot materialization.

The reference slices sub-latents with stride 1 (``latents[:, i:i+rd]``,
:104, :117) which *overlaps* chunks whenever C > 1; the evident intent is
disjoint per-codebook chunks. ``slicing="chunk"`` (default) implements
the intent; ``slicing="overlap"`` reproduces the reference exactly.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.vq import l2_argmin
from .base import Array, mse_loss


def _uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


def rotate_to(e: Array, q: Array, eps: float = 1e-6) -> Array:
    """Rotation trick (Fifty et al., arXiv:2410.06424 — PAPERS.md):
    returns ``q`` in VALUE, but the gradient w.r.t. ``e`` is
    ``sg[lambda * R]`` — the rotation-and-rescale carrying ``e`` onto
    ``q`` — instead of the straight-through identity. Gradients then
    preserve their angle to the quantized vector, which the paper shows
    improves codebook usage and reconstruction across VQ-VAEs.

    ``R e`` is evaluated as ``e - 2 r (r.e) + 2 qhat (ehat.e)`` with
    ``r = (ehat + qhat)/|ehat + qhat|`` (two Householder reflections —
    O(D) per vector, no matrix is materialized); ``lambda, r, qhat,
    ehat`` are constants (stop_gradient). Norm math runs in float32 for
    bf16 operands. Beyond the reference (its VQ uses STE only,
    /root/reference/models/vq_vae.py:52-55).
    """
    sg = jax.lax.stop_gradient
    dt = e.dtype
    e32, q32 = e.astype(jnp.float32), q.astype(jnp.float32)
    en = jnp.linalg.norm(e32, axis=-1, keepdims=True)
    qn = jnp.linalg.norm(q32, axis=-1, keepdims=True)
    ehat = e32 / jnp.maximum(en, eps)
    qhat = q32 / jnp.maximum(qn, eps)
    r = ehat + qhat
    # antiparallel e/q (r ~ 0): any reflection plane through the
    # bisector works; eps floors the norm and the value stays exact
    # because the qhat term alone already lands on q there
    r = r / jnp.maximum(jnp.linalg.norm(r, axis=-1, keepdims=True), eps)
    lam = (qn / jnp.maximum(en, eps)).astype(dt)
    ehat, qhat, r = (sg(x.astype(dt)) for x in (ehat, qhat, r))
    rot = (e - 2.0 * r * jnp.sum(r * e, axis=-1, keepdims=True)
           + 2.0 * qhat * jnp.sum(ehat * e, axis=-1, keepdims=True))
    return sg(lam) * rot


class VectorQuantizerMS(nn.Module):
    """Single codebook; inds search separated from latent retrieval."""

    num_embeddings: int
    embedding_dim: int
    beta: float = 0.25
    grad_estimator: str = "ste"   # "ste" (reference) | "rotation"
                                  # (rotate_to — arXiv:2410.06424)

    def setup(self):
        self.embedding = self.param(
            "embedding", _uniform_init(1.0 / self.num_embeddings),
            (self.num_embeddings, self.embedding_dim))

    def compute_inds(self, latents: Array) -> Array:
        """[B, H, W, D] -> int32 [B, H, W] (no gradient)."""
        flat = latents.reshape(-1, self.embedding_dim)
        inds = l2_argmin(jax.lax.stop_gradient(flat),
                         jax.lax.stop_gradient(self.embedding))
        return inds.reshape(latents.shape[:-1])

    def compute_latents(self, latents: Array, inds: Array) -> Tuple[Array, Array]:
        """Gather + VQ losses + straight-through estimator."""
        quantized = jnp.take(self.embedding, inds.reshape(-1), axis=0)
        quantized = quantized.reshape(latents.shape)
        commitment = mse_loss(jax.lax.stop_gradient(quantized), latents)
        embedding_loss = mse_loss(quantized, jax.lax.stop_gradient(latents))
        vq_loss = commitment * self.beta + embedding_loss
        if self.grad_estimator == "rotation":
            st = rotate_to(latents, jax.lax.stop_gradient(quantized))
        else:
            st = latents + jax.lax.stop_gradient(quantized - latents)
        return st, vq_loss

    def __call__(self, latents: Array, inds: bool = False):
        encoding_inds = self.compute_inds(latents)
        quantized, vq_loss = self.compute_latents(latents, encoding_inds)
        if inds:
            return quantized, vq_loss, encoding_inds
        return quantized, vq_loss


class MultipleCodebookVectorQuantizer(nn.Module):
    """C codebooks, each owning ``embedding_dim / C`` channels."""

    num_embeddings: int
    embedding_dim: int
    codebooks: int = 1
    beta: float = 0.25
    slicing: str = "chunk"          # "chunk" (intent) | "overlap" (reference)
    grad_estimator: str = "ste"     # "ste" | "rotation" (see rotate_to)

    def setup(self):
        assert self.embedding_dim % self.codebooks == 0
        rd = self.embedding_dim // self.codebooks
        self.reduced_embedding_dim = rd
        self.quantizers = [
            VectorQuantizerMS(self.num_embeddings, rd, self.beta,
                              grad_estimator=self.grad_estimator)
            for _ in range(self.codebooks)]

    def _sub(self, latents: Array, i: int) -> Array:
        rd = self.reduced_embedding_dim
        if self.slicing == "overlap":
            return latents[..., i:i + rd]
        return latents[..., i * rd:(i + 1) * rd]

    def compute_inds(self, latents: Array) -> Array:
        """[B, H, W, D] -> int32 [B, C, H, W]."""
        inds = [q.compute_inds(self._sub(latents, i))
                for i, q in enumerate(self.quantizers)]
        return jnp.stack(inds, axis=1)

    def compute_latents(self, latents: Array, inds: Array) -> Tuple[Array, Array]:
        outs, losses = [], []
        for i, q in enumerate(self.quantizers):
            sub_q, sub_loss = q.compute_latents(self._sub(latents, i),
                                                inds[:, i])
            outs.append(sub_q)
            losses.append(sub_loss)
        return jnp.concatenate(outs, axis=-1), sum(losses)

    def __call__(self, latents: Array, inds: bool = False):
        encoding_inds = self.compute_inds(latents)
        quantized, vq_loss = self.compute_latents(latents, encoding_inds)
        if inds:
            return quantized, vq_loss, encoding_inds
        return quantized, vq_loss
