"""CT-VAE: CausalTransition module + CTMCQVAE model.

Parity target: /root/reference/models/ct_mcq_vae.py (712 LoC). The causal
variables are the ``S = codebooks * h * w`` latent sites, each carrying an
N-dim distribution over codebook entries (N = num_embeddings).

TPU-first redesign of the three reference hot spots:
* pairwise graph discovery — factored left/right MXU projections instead
  of the [B, S*S, 2N] concat blow-up or the Python row loop
  (comp/mem switch, reference :64-66, :140-174) — see ``ops/pairwise.py``;
* the GNN — dense masked multi-head GATv2 attention instead of
  ``dense_to_sparse`` + scatter (reference :211-214) — see ``ops/gat.py``;
* ``forward_transition``'s per-action Python loop (reference :282-295)
  is folded into the batch: all A actions are evaluated in ONE
  forward_action pass over an [A*B] virtual batch.

Layout: sequences are [B, S, N] (the reference moves NCHW image layout
through [B, N, K*H, W]; the site ordering (k, h, w) row-major is
identical).
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.gat import GATv2Stack
from ..ops.pairwise import pairwise_mlp_scores
from .backbones import VQDecoder, VQEncoder
from .base import (Array, BaseVAE, ModelOutput, cross_entropy_from_probs, mse_loss, upcast32)
from .quantizers import (MultipleCodebookVectorQuantizer,
                         codebook_perplexity)

CLAMP_EPS = 1e-4


def sinusoidal_pe(max_len: int, d_model: int):
    """Standard sinusoidal positional encoding table [max_len, d_model]
    (reference PositionalEncoding, ct_mcq_vae.py:14-38). Computed on the
    host in float64 so the table is exact at any model dtype (callers
    cast; a float32 table would put a 1e-7 floor under float64 parity)."""
    import numpy as np
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                      * (-math.log(10000.0) / d_model))
    angles = position * div_term
    pe = np.zeros((max_len, d_model))
    pe[:, 0::2] = np.sin(angles)
    pe[:, 1::2] = np.cos(angles[:, : (d_model // 2)])
    return pe


def st_bernoulli_gumbel(rng: Array, probs: Array, tau: float = 1.0) -> Array:
    """Straight-through Gumbel-softmax Bernoulli sample of ``probs``
    (reference ``_sample_bernoulli``, :180-185): logits are
    log(clamp([1-p, p])), hard one-hot forward, soft gradient."""
    logits = jnp.log(jnp.clip(jnp.stack([1.0 - probs, probs], axis=-1),
                              CLAMP_EPS, None))
    g = jax.random.gumbel(rng, logits.shape)
    y_soft = jax.nn.softmax((logits + g) / tau, axis=-1)
    hard = (jnp.argmax(y_soft, axis=-1) == 1).astype(probs.dtype)
    return hard + y_soft[..., 1] - jax.lax.stop_gradient(y_soft[..., 1])


class CausalTransition(nn.Module):
    """Operates on one-hot codebook distributions over S causal variables."""

    input_dim: int                       # N = num_embeddings
    action_dim: int
    latent_dims: Optional[Sequence[int]] = None     # (discoverer_hidden, *gnn_hidden)
    noise: str = "off"                   # off | exo | endo
    c_alpha: float = 0.7
    c_beta: float = 0.4
    c_delta: float = 0.4
    c_epsilon: float = 0.4
    dropout_rate: float = 0.1
    pairwise_block_rows: Optional[int] = None   # None = all rows at once
    gat_block_cols: int = 0   # >0 bounds the GAT attention workspace
    max_len: int = 4096
    dtype: jnp.dtype = jnp.float32
    seq_axis: Optional[str] = None   # mesh axis for sequence parallelism:
                                     # shards the target-node axis of the
                                     # O(S^2) pairwise/GAT domains across
                                     # chips (parallel/mesh.py shard_dim)

    @property
    def _ldims(self):
        return tuple(self.latent_dims) if self.latent_dims else (800, 100)

    @property
    def nb_heads(self) -> int:
        return 1 + self.action_dim

    def setup(self):
        N, A, H = self.input_dim, self.action_dim, self._ldims[0]
        self.a_dense = nn.Dense(N, dtype=self.dtype, name="a_dense")
        self.pe_table = jnp.asarray(sinusoidal_pe(self.max_len, N),
                                    self.dtype)
        self.pe_dropout = nn.Dropout(self.dropout_rate)
        # (A+1) pairwise discoverers, stacked; first layer factored into
        # left/right halves of the concat (see ops/pairwise.py).
        init = nn.initializers.lecun_normal()
        self.disc_w1l = self.param("disc_w1l", init, (A + 1, N, H), self.dtype)
        self.disc_w1r = self.param("disc_w1r", init, (A + 1, N, H), self.dtype)
        self.disc_b1 = self.param("disc_b1", nn.initializers.zeros,
                                  (A + 1, H), self.dtype)
        self.disc_w2 = self.param("disc_w2", init, (A + 1, H, 1), self.dtype)
        self.disc_b2 = self.param("disc_b2", nn.initializers.zeros,
                                  (A + 1, 1), self.dtype)
        # mask MLP params declared eagerly (self.param in setup) so a
        # base-mode init still creates them — the mode-uniform batches mean
        # any one init pass must cover every mode's parameters.
        self.mask_kernel = self.param("mask_kernel", init, (A + N, N),
                                      self.dtype)
        self.mask_bias = self.param("mask_bias", nn.initializers.zeros,
                                    (N,), self.dtype)
        self.graph_transitioner = GATv2Stack(
            input_dim=N, hidden=self._ldims[1:], heads=self.nb_heads,
            dtype=self.dtype, block_cols=self.gat_block_cols,
            seq_axis=self.seq_axis)

    # ------------------------------------------------------------------
    # building blocks
    # ------------------------------------------------------------------

    def pos_encoding(self, x: Array, *, train: bool) -> Array:
        pe = self.pe_table[None, : x.shape[1], :].astype(x.dtype)
        return self.pe_dropout(x + pe, deterministic=not train)

    def _compute_mask(self, one_hot_latent: Array, action: Array, *,
                      train: bool) -> Array:
        """Gumbel-hard per-variable intervention mask [B, S, 1]
        (reference :117-127)."""
        B, S, N = one_hot_latent.shape
        a_rep = jnp.repeat(action[:, None, :].astype(one_hot_latent.dtype),
                           S, axis=1)
        pos_embed = self.pos_encoding(jnp.zeros_like(one_hot_latent),
                                      train=train)
        inter_mask = jax.nn.sigmoid(
            jnp.concatenate([a_rep, pos_embed], axis=-1) @ self.mask_kernel
            + self.mask_bias)
        inter_masked = jnp.sum(one_hot_latent * inter_mask, axis=-1)  # [B,S]
        mask = st_bernoulli_gumbel(self.make_rng("gumbel"), inter_masked)
        return mask[..., None]

    def _no_inter_scores(self, latent: Array) -> Array:
        """Discoverer-0 (no-intervention) pairwise scores [B, S, S]."""
        lat = latent.astype(self.dtype)
        u0 = lat @ self.disc_w1l[0]
        v0 = lat @ self.disc_w1r[0]
        return pairwise_mlp_scores(
            u0, v0, self.disc_w2[0, :, 0], self.disc_b2[0, 0],
            self.disc_b1[0], block_rows=self.pairwise_block_rows,
            seq_axis=self.seq_axis)

    def _compute_adj(self, latent: Array, action: Array, mask: Array,
                     no_inter: Optional[Array] = None) -> Array:
        """Mask-mixed adjacency coefficients [B, S, S] (reference
        :140-177). Discoverer 0 scores the no-intervention graph for all
        samples; discoverer ``1 + argmax(action)`` scores each sample's
        intervened graph. ``no_inter`` lets ``forward_transition`` pass
        precomputed discoverer-0 scores (identical across its action
        hypotheses) instead of rescoring them A times."""
        lat = latent.astype(self.dtype)
        if no_inter is None:
            no_inter = self._no_inter_scores(latent)
        # per-sample discoverer selected by action id
        aid = 1 + jnp.argmax(action, axis=-1)                    # [B]
        w1l = self.disc_w1l[aid]                                 # [B, N, H]
        w1r = self.disc_w1r[aid]
        ui = jnp.einsum("bsn,bnh->bsh", lat, w1l)
        vi = jnp.einsum("bsn,bnh->bsh", lat, w1r)
        inter = pairwise_mlp_scores(
            ui, vi, self.disc_w2[aid, :, 0], self.disc_b2[aid, 0],
            self.disc_b1[aid], block_rows=self.pairwise_block_rows,
            seq_axis=self.seq_axis)
        return no_inter * (1 - mask) + inter * mask

    def _pad_adjacency(self, adjacency: Array, vs: int) -> Array:
        """Append ``vs`` support nodes: incoming edge weight 1 from every
        variable (right columns), no outgoing edges (bottom rows) —
        reference padding_v/padding_h (:193-209)."""
        B, S, _ = adjacency.shape
        adj = jnp.concatenate(
            [adjacency, jnp.ones((B, S, vs), adjacency.dtype)], axis=2)
        adj = jnp.concatenate(
            [adj, jnp.zeros((B, vs, S + vs), adjacency.dtype)], axis=1)
        return adj

    def _compute_y_identity(self, latent: Array, *, train: bool) -> Array:
        """Exact closed form of ``_compute_y`` for the identity adjacency
        (the base-mode regularizer pass, reference :231-255 with
        action=0): each variable's only incoming edge is its self-edge,
        so the GATv2 stack collapses to per-node linear layers
        (ops/gat.py identity_call — identical values AND gradients), and
        the support/action nodes never influence variable outputs (no
        outgoing edges). With mask == 0 the head-mix reduces to head 0.
        O(S F^2 H) instead of O(S^2 H F) per layer."""
        B, S, N = latent.shape
        if self.noise == "exo":
            latent = latent + jax.random.normal(self.make_rng("noise"),
                                                latent.shape, latent.dtype)
        elif self.noise == "endo":
            # the endo noise node has no outgoing edges; draw and discard
            # to keep the "noise" stream call count identical to the
            # general path (later draws stay bit-identical)
            jax.random.normal(self.make_rng("noise"), (B, N), latent.dtype)
        nodes_y = self.graph_transitioner.identity_forward(latent)
        return jax.nn.softmax(nodes_y[..., :N], axis=-1)

    def _compute_y(self, latent: Array, action: Array, adjacency: Array,
                   mask: Array, *, train: bool,
                   mask_is_zero: bool = False) -> Array:
        """GNN transition + action-head selection (reference :188-228).

        The final GAT layer computes ONLY the heads the selection below
        keeps — head 0 and each sample's action head (or just head 0
        when the caller statically knows ``mask == 0``, the base-mode
        identity-regularizer pass where the action-head term is
        multiplied by zero): exact in values and gradients, at 2/(1+A)
        of the final layer's attention-domain cost (ops/gat.py
        ``heads_call``)."""
        B, S, N = latent.shape
        action = action.astype(self.dtype)
        action_node = self.a_dense(action)                       # [B, N]
        if self.noise == "exo":
            latent = latent + jax.random.normal(self.make_rng("noise"),
                                                latent.shape, latent.dtype)
            var_supp = action_node[:, None, :]
        elif self.noise == "endo":
            noise_node = jax.random.normal(self.make_rng("noise"),
                                           action_node.shape,
                                           action_node.dtype)
            var_supp = jnp.stack([action_node, noise_node], axis=1)
        else:
            var_supp = action_node[:, None, :]
        vs = var_supp.shape[1]

        nodes = jnp.concatenate([latent, var_supp], axis=1)      # [B, S+vs, N]
        padded_adj = self._pad_adjacency(adjacency, vs)

        # head selection: head 0 = no-intervention, head 1+a = action a.
        # Only those heads are computed at the final layer (exact); the
        # per-sample gather happens on the head *parameters* inside
        # heads_call, so no post-hoc dynamic gather kernel exists at all
        # (the old full-output dynamic gather profiled as the slowest
        # kernel of the action step, 13% — scripts/profile_ct.py).
        action_arg = jnp.argmax(action, axis=-1)                 # [B]
        if mask_is_zero:
            head_idx = jnp.zeros((B, 1), jnp.int32)
            heads = self.graph_transitioner.select_forward(
                nodes, padded_adj, head_idx)[:, :S]              # [B,S,1,N]
            mixed = heads[:, :, 0, :]
        else:
            head_idx = jnp.stack(
                [jnp.zeros((B,), jnp.int32),
                 1 + action_arg.astype(jnp.int32)], axis=1)      # [B, 2]
            heads = self.graph_transitioner.select_forward(
                nodes, padded_adj, head_idx)[:, :S]              # [B,S,2,N]
            mixed = heads[:, :, 0, :] * (1 - mask) + heads[:, :, 1, :] * mask
        return jax.nn.softmax(mixed, axis=-1)

    # ------------------------------------------------------------------
    # forward modes (reference :231-295)
    # ------------------------------------------------------------------

    def __call__(self, latent: Array, *, train: bool = False, **kwargs):
        """Identity transition (action = 0), regularized toward identity."""
        B, S, N = latent.shape
        mask = jnp.zeros((B, S, 1), latent.dtype)
        pos_latent = self.pos_encoding(latent, train=train)
        action = jnp.zeros((B, self.action_dim), latent.dtype)

        adjacency = self._compute_adj(pos_latent, action, mask)
        causal_graph = st_bernoulli_gumbel(self.make_rng("gumbel"), adjacency)
        weighted = adjacency * causal_graph
        latent_y = self._compute_y(pos_latent, action, weighted, mask,
                                   train=train, mask_is_zero=True)

        identity = jnp.broadcast_to(jnp.eye(S, dtype=latent.dtype), (B, S, S))
        y_id = self._compute_y_identity(pos_latent, train=train)
        ct_reg = self.c_alpha * (
            cross_entropy_from_probs(y_id.reshape(-1, N),
                                     jnp.argmax(latent.reshape(-1, N), -1))
            + mse_loss(causal_graph, identity))
        return latent_y, ct_reg, {"ct_adjacency": jnp.mean(adjacency, axis=0)}

    def forward_action(self, latent: Array, action: Array, *,
                       train: bool = False, _pos_latent: Array = None,
                       _no_inter: Array = None, **kwargs):
        """Masked intervention (reference :259-278).

        ``_pos_latent`` / ``_no_inter`` are ``forward_transition``'s
        fast path: the A action hypotheses share one positionally-encoded
        latent and one set of discoverer-0 scores (see there)."""
        B, S, N = latent.shape
        mask = self._compute_mask(latent, action, train=train)
        pos_latent = (self.pos_encoding(latent, train=train)
                      if _pos_latent is None else _pos_latent)

        adjacency = self._compute_adj(pos_latent, action, mask,
                                      no_inter=_no_inter)
        causal_graph = st_bernoulli_gumbel(self.make_rng("gumbel"), adjacency)
        weighted = adjacency * causal_graph
        latent_y = self._compute_y(pos_latent, action, weighted, mask,
                                   train=train)

        ct_reg = (self.c_beta * self.adjacency_kl_loss(adjacency)
                  + self.c_delta * self.graph_size_loss(causal_graph)
                  + self.c_epsilon * self.positive_trial_loss(adjacency))
        return latent_y, ct_reg, {"ct_mask": jnp.mean(mask[..., 0], axis=0),
                                  "ct_adjacency": jnp.mean(adjacency, axis=0)}

    def forward_transition(self, latent: Array, latent_y: Array, *,
                           train: bool = False, **kwargs):
        """Action classification: try all A actions at once, softmin of CE
        distances (reference :282-295, vectorized over the action axis).

        The A hypotheses see the SAME input latent, so the positional
        encoding (one dropout draw) and the discoverer-0 pairwise scores
        are computed once on [B] and tiled — bit-identical in eval, and
        common random numbers across hypotheses in training (lower
        variance in the CE-distance comparison than independent draws);
        only the per-action discoverers, masks, edge sampling and the GNN
        run on the [A*B] virtual batch. (_compute_mask's pos_embed is
        also action-independent but is NOT hoisted: it is [A*B, S, N]
        elementwise work — ~0.8M elements vs the ~7e9-element GNN logits
        domains — so sharing it would complicate the API for no
        measurable win.)"""
        B, S, N = latent.shape
        A = self.action_dim
        actions = jnp.eye(A, dtype=latent.dtype)                  # [A, A]
        lat_rep = jnp.broadcast_to(latent[None], (A, B, S, N)).reshape(
            A * B, S, N)
        act_rep = jnp.repeat(actions[:, None, :], B, axis=1).reshape(A * B, A)
        pos_latent = self.pos_encoding(latent, train=train)       # [B, S, N]
        no_inter = self._no_inter_scores(pos_latent)              # [B, S, S]
        pos_rep = jnp.broadcast_to(pos_latent[None], (A, B, S, N)).reshape(
            A * B, S, N)
        ni_rep = jnp.broadcast_to(no_inter[None], (A, B, S, S)).reshape(
            A * B, S, S)
        # flash_scope: under CTVAE_FLASH_GAT=auto the causal path's GNN
        # traces through the flash-fused Pallas kernel (+15% full-step
        # on v5e); action/base keep the XLA path, which measures faster
        # there (ops/gat.py _use_flash).
        from ..ops.gat import flash_scope
        with flash_scope():
            y_pred, _, _ = self.forward_action(lat_rep, act_rep,
                                               train=train,
                                               _pos_latent=pos_rep,
                                               _no_inter=ni_rep)
        y_pred = y_pred.reshape(A, B, S, N)

        y_inds = jnp.argmax(latent_y, axis=-1)                    # [B, S]
        logits = jax.nn.log_softmax(
            jnp.log(jnp.clip(y_pred, CLAMP_EPS, None)), axis=-1)
        nll = -jnp.take_along_axis(logits, y_inds[None, :, :, None],
                                   axis=-1)[..., 0]               # [A, B, S]
        distances = jnp.mean(nll, axis=-1).T                      # [B, A]
        action_probas = jax.nn.softmax(-distances, axis=-1)       # softmin
        return action_probas, jnp.asarray(0.0), {}

    # ------------------------------------------------------------------
    # losses & metrics (reference :299-333)
    # ------------------------------------------------------------------

    def latent_loss(self, latent: Array, latent_y: Array) -> Array:
        """CE(latent distributions, argmax of detached target)."""
        latent_y = jax.lax.stop_gradient(latent_y)
        N = latent.shape[-1]
        return cross_entropy_from_probs(
            latent.reshape(-1, N), jnp.argmax(latent_y.reshape(-1, N), -1))

    def adjacency_kl_loss(self, adjacency: Array) -> Array:
        """KL(log_softmax(adj) || softmax(uniform noise)) batchmean
        (reference :314-317 — the target is *random*, i.e. no structural
        prior on the graph)."""
        B = adjacency.shape[0]
        log_q = jax.nn.log_softmax(adjacency.reshape(B, -1), axis=-1)
        target = jax.nn.softmax(
            jax.random.uniform(self.make_rng("noise"), log_q.shape), axis=-1)
        kl = jnp.sum(target * (jnp.log(jnp.clip(target, 1e-12, None)) - log_q),
                     axis=-1)
        return jnp.mean(kl)

    @staticmethod
    def graph_size_loss(causal_graph: Array) -> Array:
        return jnp.mean(jnp.linalg.matrix_norm(causal_graph))

    @staticmethod
    def positive_trial_loss(adjacency: Array) -> Array:
        """||prod_j (1 - adj_ij)||_2 per sample (reference :322-323).
        Grad-safe: at S = 64+ variables the product underflows f32 when
        squared inside the norm, and d||x||/dx at 0 is NaN in autodiff
        (torch's subgradient convention returns 0 there, so the reference
        never trips this). The double-where pattern keeps the gradient 0."""
        prod = jnp.prod(1.0 - adjacency, axis=-1)
        sq = jnp.sum(jnp.square(prod), axis=-1)
        safe = jnp.sqrt(jnp.where(sq == 0, 1.0, sq))
        return jnp.mean(jnp.where(sq == 0, 0.0, safe))

    @staticmethod
    def causal_accuracy(action_probas: Array, action: Array) -> Array:
        return jnp.mean(upcast32((jnp.argmax(action_probas, -1)
                         == jnp.argmax(action, -1))))

    @staticmethod
    def causal_undirected_accuracy(action_probas: Array, action: Array) -> Array:
        dim = action.shape[-1]
        recons = jax.nn.one_hot(jnp.argmax(action_probas, -1), dim)
        recons_dir = recons[:, dim // 2:] + recons[:, : dim // 2]
        action_dir = action[:, dim // 2:] + action[:, : dim // 2]
        return CausalTransition.causal_accuracy(recons_dir, action_dir)


class CTMCQVAE(BaseVAE):
    """MCQ-VAE backbone + CausalTransition over quantization indices.

    Parity target: reference CTMCQVAE (ct_mcq_vae.py:339-713); mode
    dispatch ``base`` / ``action`` / ``causal`` via the static ``mode``
    kwarg (all elements of a batch share one mode, like the reference's
    batch-uniform mode list, :585-586).
    """

    # Mode registry (reference FORWARD_MODES dict, ct_mcq_vae.py:570-574).
    # The trainer keys one jitted step per mode off this attribute; a
    # model without it is single-mode.
    FORWARD_MODES = ("base", "action", "causal")

    in_channels: int = 3
    embedding_dim: int = 128
    action_dim: int = 12
    num_embeddings: int = 64
    hidden_dims: Optional[Sequence[int]] = None
    causal_hidden_dims: Optional[Sequence[int]] = None
    beta: float = 0.25
    gamma: float = 0.25
    img_size: int = 64
    codebooks: int = 1
    skip_transition: bool = False
    noise: str = "off"
    c_alpha: float = 0.7
    c_beta: float = 0.4
    c_delta: float = 0.4
    c_epsilon: float = 0.4
    slicing: str = "chunk"
    grad_estimator: str = "ste"   # "ste" (reference) | "rotation"
    ema: bool = False             # EMA codebook learning + optional
    ema_decay: float = 0.99       # dead-code revival (opt-in, beyond
    revive_threshold: float = 0.0  # the reference — see quantizers.py)
    pairwise_block_rows: Optional[int] = None
    gat_block_cols: int = 0
    ct_dropout_rate: float = 0.1   # PE dropout (reference
                                   # PositionalEncoding default, :19)
    seq_axis: Optional[str] = None   # sequence parallelism for the CT
                                     # layer (exp_params.sharding: sp
                                     # wires this to "model" — run.py)
    dtype: jnp.dtype = jnp.float32

    @property
    def _hdims(self):
        return tuple(self.hidden_dims) if self.hidden_dims else (128, 256)

    @property
    def nb_latents(self) -> int:
        return self.img_size // (2 ** len(self._hdims))

    def setup(self):
        hd = self._hdims
        self.encoder = VQEncoder(hd, self.embedding_dim, dtype=self.dtype)
        self.vq_layer = MultipleCodebookVectorQuantizer(
            self.num_embeddings, self.embedding_dim, self.codebooks,
            self.beta, slicing=self.slicing,
            grad_estimator=self.grad_estimator, ema=self.ema,
            ema_decay=self.ema_decay,
            revive_threshold=self.revive_threshold)
        self.ct_layer = CausalTransition(
            input_dim=self.num_embeddings, action_dim=self.action_dim,
            latent_dims=self.causal_hidden_dims, noise=self.noise,
            c_alpha=self.c_alpha, c_beta=self.c_beta, c_delta=self.c_delta,
            c_epsilon=self.c_epsilon, dropout_rate=self.ct_dropout_rate,
            pairwise_block_rows=self.pairwise_block_rows,
            gat_block_cols=self.gat_block_cols, seq_axis=self.seq_axis,
            dtype=self.dtype)
        self.decoder = VQDecoder(hd, out_channels=self.in_channels,
                                 dtype=self.dtype)

    # --- plumbing ------------------------------------------------------

    def encode(self, x: Array, *, train: bool = False):
        return [self.encoder(x)]

    def decode(self, z: Array, *, train: bool = False) -> Array:
        return self.decoder(z)

    def ct_preprocess(self, inds: Array) -> Array:
        """int inds [B, K, h, w] -> one-hot sequence [B, K*h*w, N]
        (reference :472-483; site order (k, h, w) row-major matches)."""
        B = inds.shape[0]
        one_hot = jax.nn.one_hot(inds, self.num_embeddings,
                                 dtype=self.dtype)
        return one_hot.reshape(B, -1, self.num_embeddings)

    def ct_postprocess(self, seq: Array) -> Array:
        """[B, S, N] distributions -> int inds [B, K, h, w] via argmax
        (reference :485-496)."""
        B = seq.shape[0]
        hw = self.nb_latents
        inds = jnp.argmax(seq, axis=-1)
        return inds.reshape(B, self.codebooks, hw, hw)

    def _zero_metrics(self, mode_id: float) -> Dict[str, Array]:
        # mode_id only: causal_acc/causal_nodir_acc are emitted ONLY by
        # causal batches (like the reference), so validation averages of
        # those keys aren't diluted by zeros from base/action batches.
        # Per-mode train steps are separate jits, so per-mode metric key
        # sets are fine.
        return {"mode_id": jnp.asarray(mode_id)}

    # --- forward modes (reference :501-591) -----------------------------

    def forward_base(self, x: Array, *, train: bool = False) -> ModelOutput:
        latents = self.encoder(x)
        inds = self.vq_layer.compute_inds(latents)
        if self.ema and train:
            # EMA stats track the ENCODER's assignments; decode below
            # goes through CT-modified inds (see quantizers.update_stats)
            self.vq_layer.update_stats(latents, inds)
        one_hot = self.ct_preprocess(inds)
        ct_seq, ct_reg, ct_metrics = self.ct_layer(one_hot, train=train)
        ct_loss = ct_reg + self.ct_layer.latent_loss(ct_seq, one_hot)
        ct_inds = self.ct_postprocess(ct_seq)
        use_inds = inds if self.skip_transition else ct_inds
        quantized, vq_loss = self.vq_layer.compute_latents(latents, use_inds)
        recons = self.decoder(quantized)
        return {"recons": recons, "input": x, "vq_loss": vq_loss,
                "ct_loss": ct_loss, "mode": "base",
                "metrics": {**self._zero_metrics(0.0), **ct_metrics,
                            "codebook_perplexity": codebook_perplexity(
                                inds, self.num_embeddings)}}

    def forward_action(self, x: Array, action: Array = None,
                       input_y: Array = None, *,
                       train: bool = False) -> ModelOutput:
        # x and input_y ride ONE encoder pass (batch-concatenated): twice
        # the matmul M-dim, half the kernel launches vs the reference's
        # second encode (ct_mcq_vae.py:536) — layout-free speedup on MXU.
        latents2 = self.encoder(jnp.concatenate([x, input_y], axis=0))
        latents, latents_y = jnp.split(latents2, 2, axis=0)
        inds = self.vq_layer.compute_inds(latents)
        if self.ema and train:
            self.vq_layer.update_stats(latents, inds)
        one_hot = self.ct_preprocess(inds)
        ct_seq, ct_reg, ct_metrics = self.ct_layer.forward_action(
            one_hot, action, train=train)
        target_inds = self.vq_layer.compute_inds(latents_y)
        ct_loss = ct_reg + self.ct_layer.latent_loss(
            ct_seq, self.ct_preprocess(target_inds))
        ct_inds = self.ct_postprocess(ct_seq)
        use_inds = inds if self.skip_transition else ct_inds
        quantized, _ = self.vq_layer.compute_latents(latents, use_inds)
        recons = self.decoder(quantized)
        return {"recons": recons, "input": input_y,
                "vq_loss": jnp.asarray(0.0), "ct_loss": ct_loss,
                "mode": "action",
                "metrics": {**self._zero_metrics(1.0), **ct_metrics,
                            "codebook_perplexity": codebook_perplexity(
                                inds, self.num_embeddings)}}

    def forward_causal(self, x: Array, input_y: Array = None,
                       action: Array = None, *,
                       train: bool = False) -> ModelOutput:
        latents2 = self.encoder(jnp.concatenate([x, input_y], axis=0))
        latents_x, latents_y = jnp.split(latents2, 2, axis=0)
        inds_x = self.vq_layer.compute_inds(latents_x)
        inds_y = self.vq_layer.compute_inds(latents_y)
        if self.ema and train:
            self.vq_layer.update_stats(latents_x, inds_x)
        probas, ct_reg, _ = self.ct_layer.forward_transition(
            self.ct_preprocess(inds_x), self.ct_preprocess(inds_y),
            train=train)
        acc = self.ct_layer.causal_accuracy(probas, action)
        nodir = self.ct_layer.causal_undirected_accuracy(probas, action)
        return {"recons": probas, "input": action,
                "vq_loss": jnp.asarray(0.0), "ct_loss": ct_reg,
                "mode": "causal",
                "metrics": {"causal_acc": acc, "causal_nodir_acc": nodir,
                            "mode_id": jnp.asarray(2.0),
                            "codebook_perplexity": codebook_perplexity(
                                inds_x, self.num_embeddings)}}

    def __call__(self, x: Array, input_y: Array = None, action: Array = None,
                 mode: str = "base", *, train: bool = False,
                 **kwargs) -> ModelOutput:
        if isinstance(mode, (list, tuple)):
            mode = mode[0]
        if mode == "base":
            return self.forward_base(x, train=train)
        if mode == "action":
            return self.forward_action(x, action=action, input_y=input_y,
                                       train=train)
        if mode == "causal":
            return self.forward_causal(x, input_y=input_y, action=action,
                                       train=train)
        raise ValueError(f"unknown mode {mode!r}")

    def generate(self, x: Array, **kwargs) -> Array:
        if kwargs.get("mode") == "causal":
            kwargs["mode"] = "action"
        return self(x, **kwargs)["recons"]

    def sample(self, num_samples: int, *, train: bool = False) -> Array:
        z = jax.random.normal(
            self.make_rng("reparam"),
            (num_samples, self.nb_latents, self.nb_latents,
             self.embedding_dim))
        quantized, _ = self.vq_layer(z)
        return self.decoder(quantized)

    def walk(self, num_steps: int, num_dims: int, num_walks: int, *,
             train: bool = False) -> Array:
        """Latent-space walks: hold one random base latent per walk,
        re-randomize ``num_dims`` random channels at every step, decode
        through the quantizer. Returns [num_walks * num_steps, H, W, C]
        (a working version of the reference's commented-out ``walk``,
        ct_mcq_vae.py:643-675)."""
        rng = self.make_rng("reparam")
        r_base, r_dim, r_idx = jax.random.split(rng, 3)
        hw, D = self.nb_latents, self.embedding_dim
        B = num_steps * num_walks
        base = jnp.repeat(jax.random.normal(r_base, (1, hw, hw, D)), B,
                          axis=0)
        # per-step values for the walked channels, constant over the grid
        vals = jax.random.normal(r_dim, (B, num_dims))
        vals = jnp.broadcast_to(vals[:, None, None, :], (B, hw, hw, num_dims))
        # per-walk channel choice, shared by that walk's steps
        idx = jax.random.randint(r_idx, (num_walks, num_dims), 0, D)
        idx = jnp.repeat(idx, num_steps, axis=0)                 # [B, d]
        onehots = jax.nn.one_hot(idx, D, dtype=base.dtype)       # [B, d, D]
        keep = 1.0 - jnp.clip(jnp.sum(onehots, axis=1), 0, 1)    # [B, D]
        replaced = jnp.einsum("bhwd,bdD->bhwD", vals, onehots)
        z = base * keep[:, None, None, :] + replaced
        quantized, _ = self.vq_layer(z)
        return self.decoder(quantized)

    def navigate(self, x: Array, y: Array, steps: int,
                 save_inds: bool = False, *, train: bool = False):
        """Latent traversal from image ``x`` to image ``y``: encode both,
        linearly interpolate ``steps`` intermediates in pre-quantization
        latent space, quantize each waypoint, decode. Returns
        [steps+2, H, W, C] (plus codebook indices when ``save_inds``).

        A working version of the reference's commented-out ``navigate``
        (ct_mcq_vae.py:688-713): its bilinear ``Upsample(size=(.., S),
        align_corners=True)`` over the two endpoints is exactly linear
        interpolation with t = j/(S-1), so we use a linspace directly.
        """
        enc = self.encoder(jnp.stack([x, y]))          # [2, h, w, c]
        t = jnp.linspace(0.0, 1.0, steps + 2,
                         dtype=enc.dtype)[:, None, None, None]
        z = (1.0 - t) * enc[0] + t * enc[1]            # [S, h, w, c]
        quantized, *rest = self.vq_layer(z, inds=save_inds)
        if save_inds:
            return self.decoder(quantized), rest[-1]
        return self.decoder(quantized)

    # --- loss (reference :594-620) --------------------------------------

    def loss_function(self, outputs: ModelOutput, **kwargs) -> Dict[str, Array]:
        recons, target = outputs["recons"], outputs["input"]
        vq_loss, ct_loss = outputs["vq_loss"], outputs["ct_loss"]
        if outputs.get("mode") == "causal":
            recons_loss = cross_entropy_from_probs(
                recons, jnp.argmax(target, axis=-1))
        else:
            recons_loss = mse_loss(recons, target)
        loss = recons_loss + vq_loss + self.gamma * ct_loss
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "VQ_Loss": vq_loss, "CT_Loss": ct_loss,
                **outputs.get("metrics", {})}
