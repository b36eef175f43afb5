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


def codebook_perplexity(inds: Array, num_embeddings: int) -> Array:
    """exp(entropy) of the batch's code-assignment distribution — the
    standard codebook-usage health metric (K = every code equally used,
    1 = collapse). The reference logs nothing of the sort; with EMA mode
    (and its revival knob) this is the signal to watch."""
    counts = jnp.bincount(inds.reshape(-1).astype(jnp.int32),
                          length=num_embeddings)
    probs = counts / jnp.maximum(jnp.sum(counts), 1)
    h = -jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs), 0.0))
    return jnp.exp(h)


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
    """Single codebook; inds search separated from latent retrieval.

    ``ema=True`` (opt-in, beyond the reference — its VQ trains the
    codebook by the embedding loss only, /root/reference/models/vq_vae.py:46-52)
    switches to exponential-moving-average codebook learning (van den
    Oord 2017 appendix / VQ-VAE-2): the codebook, per-code assignment
    counts and assigned-vector sums live in the mutable ``vq_stats``
    collection instead of ``params``; each train step folds the batch's
    assignment statistics into the EMA and re-normalizes with Laplace
    smoothing. The loss keeps only the β commitment term. Under SPMD the
    counts/sums reduce over the *globally sharded* batch axis inside
    jit, so XLA inserts the cross-chip reduction and every replica
    writes identical stats — no hand-rolled ``pmean``.

    ``revive_threshold > 0`` additionally re-seeds dead codes (EMA count
    below the threshold) from random encoder outputs of the current
    batch — the standard fix for codebook collapse (jukebox-style
    random restarts). Uses the ``noise`` RNG stream.
    """

    num_embeddings: int
    embedding_dim: int
    beta: float = 0.25
    grad_estimator: str = "ste"   # "ste" (reference) | "rotation"
                                  # (rotate_to — arXiv:2410.06424)
    ema: bool = False
    ema_decay: float = 0.99
    ema_eps: float = 1e-5
    revive_threshold: float = 0.0

    def setup(self):
        if self.ema:
            K, D = self.num_embeddings, self.embedding_dim
            self.ema_embed = self.variable(
                "vq_stats", "embedding",
                lambda: _uniform_init(1.0 / K)(
                    self.make_rng("params"), (K, D)))
            self.ema_cluster = self.variable(
                "vq_stats", "cluster_size", lambda: jnp.zeros((K,)))
            # initialized to the codebook itself so embed_avg/cluster
            # stays consistent from step 0
            self.ema_avg = self.variable(
                "vq_stats", "embed_avg", lambda: self.ema_embed.value)
        else:
            self.embedding = self.param(
                "embedding", _uniform_init(1.0 / self.num_embeddings),
                (self.num_embeddings, self.embedding_dim))

    @property
    def codebook(self) -> Array:
        return self.ema_embed.value if self.ema else self.embedding

    def compute_inds(self, latents: Array) -> Array:
        """[B, H, W, D] -> int32 [B, H, W] (no gradient)."""
        flat = latents.reshape(-1, self.embedding_dim)
        inds = l2_argmin(jax.lax.stop_gradient(flat),
                         jax.lax.stop_gradient(self.codebook))
        return inds.reshape(latents.shape[:-1])

    def _ema_update(self, flat: Array, inds_flat: Array) -> None:
        """Fold one batch's assignments into the EMA state (train only).

        All stats math runs in float32 regardless of the model dtype.
        The one-hot matmul form keeps both reductions on the MXU and —
        with the batch axis sharded over the mesh — lets XLA emit the
        global cross-chip sum."""
        K = self.num_embeddings
        flat = jax.lax.stop_gradient(flat).astype(jnp.float32)
        one_hot = jax.nn.one_hot(inds_flat, K, dtype=jnp.float32)  # [N, K]
        counts = jnp.sum(one_hot, axis=0)                          # [K]
        dw = jnp.einsum("nk,nd->kd", one_hot, flat)                # [K, D]
        d = self.ema_decay
        cluster = d * self.ema_cluster.value + (1.0 - d) * counts
        avg = d * self.ema_avg.value.astype(jnp.float32) + (1.0 - d) * dw
        n = jnp.sum(cluster)
        smoothed = (cluster + self.ema_eps) / (n + K * self.ema_eps) * n
        embed = avg / smoothed[:, None]
        if self.revive_threshold > 0.0:
            dead = cluster < self.revive_threshold                 # [K]
            pick = jax.random.randint(self.make_rng("noise"), (K,),
                                      0, flat.shape[0])
            repl = flat[pick]                                      # [K, D]
            embed = jnp.where(dead[:, None], repl, embed)
            avg = jnp.where(dead[:, None], repl, avg)
            cluster = jnp.where(dead, jnp.ones_like(cluster), cluster)
        dt = self.ema_embed.value.dtype
        self.ema_embed.value = embed.astype(dt)
        self.ema_avg.value = avg.astype(dt)
        self.ema_cluster.value = cluster

    def update_stats(self, latents: Array, inds: Array) -> None:
        """Explicit EMA fold-in for callers that quantize with MODIFIED
        indices (CTMCQVAE decodes through CT-transitioned inds,
        ct_vae.py forward_base/forward_action): codebook statistics must
        track the ENCODER's own nearest-neighbor assignments, so those
        callers pass ``train=False`` to compute_latents and feed the raw
        ``compute_inds`` result here instead."""
        assert self.ema, "update_stats is an EMA-mode API"
        self._ema_update(latents.reshape(-1, self.embedding_dim),
                         inds.reshape(-1))

    def compute_latents(self, latents: Array, inds: Array, *,
                        train: bool = False) -> Tuple[Array, Array]:
        """Gather + VQ losses + straight-through estimator."""
        codebook = self.codebook
        quantized = jnp.take(codebook, inds.reshape(-1), axis=0)
        quantized = quantized.reshape(latents.shape)
        commitment = mse_loss(jax.lax.stop_gradient(quantized), latents)
        if self.ema:
            # the codebook is EMA-trained, not gradient-trained: no
            # embedding loss, and the update only runs on train passes
            # (eval applies are immutable — flax would reject the write)
            vq_loss = commitment * self.beta
            if train:
                self._ema_update(latents.reshape(-1, self.embedding_dim),
                                 inds.reshape(-1))
        else:
            embedding_loss = mse_loss(quantized,
                                      jax.lax.stop_gradient(latents))
            vq_loss = commitment * self.beta + embedding_loss
        if self.grad_estimator == "rotation":
            st = rotate_to(latents, jax.lax.stop_gradient(quantized))
        else:
            st = latents + jax.lax.stop_gradient(quantized - latents)
        return st, vq_loss

    def __call__(self, latents: Array, inds: bool = False, *,
                 train: bool = False):
        encoding_inds = self.compute_inds(latents)
        quantized, vq_loss = self.compute_latents(latents, encoding_inds,
                                                  train=train)
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
    ema: bool = False               # EMA codebook learning (see
    ema_decay: float = 0.99         # VectorQuantizerMS)
    ema_eps: float = 1e-5
    revive_threshold: float = 0.0

    def setup(self):
        assert self.embedding_dim % self.codebooks == 0
        rd = self.embedding_dim // self.codebooks
        self.reduced_embedding_dim = rd
        self.quantizers = [
            VectorQuantizerMS(self.num_embeddings, rd, self.beta,
                              grad_estimator=self.grad_estimator,
                              ema=self.ema, ema_decay=self.ema_decay,
                              ema_eps=self.ema_eps,
                              revive_threshold=self.revive_threshold)
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

    def update_stats(self, latents: Array, inds: Array) -> None:
        """Per-codebook EMA fold-in (see VectorQuantizerMS.update_stats);
        ``inds`` is the stacked [B, C, H, W] from compute_inds."""
        for i, q in enumerate(self.quantizers):
            q.update_stats(self._sub(latents, i), inds[:, i])

    def compute_latents(self, latents: Array, inds: Array, *,
                        train: bool = False) -> Tuple[Array, Array]:
        outs, losses = [], []
        for i, q in enumerate(self.quantizers):
            sub_q, sub_loss = q.compute_latents(self._sub(latents, i),
                                                inds[:, i], train=train)
            outs.append(sub_q)
            losses.append(sub_loss)
        return jnp.concatenate(outs, axis=-1), sum(losses)

    def __call__(self, latents: Array, inds: bool = False, *,
                 train: bool = False):
        encoding_inds = self.compute_inds(latents)
        quantized, vq_loss = self.compute_latents(latents, encoding_inds,
                                                  train=train)
        if inds:
            return quantized, vq_loss, encoding_inds
        return quantized, vq_loss
