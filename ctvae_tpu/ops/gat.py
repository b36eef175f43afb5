"""Dense GATv2 attention over weighted adjacency matrices — the TPU-native
replacement for the reference's sparse torch-geometric pipeline
(``dense_to_sparse`` + GATv2Conv stack, /root/reference/models/ct_mcq_vae.py:102-114,
:211-214).

Semantics matched to torch-geometric's GATv2Conv (v2.2, edge_dim=1,
share_weights=False, concat=True, negative_slope=0.2):

* an entry ``adj[s, t] != 0`` is a directed edge s -> t carrying its value
  as a 1-dim edge feature,
* per head h: ``e[s,t,h] = a_h . leaky_relu(Wl x_s + Wr x_t + We w_st)``,
* attention is a softmax over the *incoming* edges of t only (non-edges
  are excluded, exactly like the sparse edge list — not merely masked
  post-softmax),
* node t's output is the alpha-weighted sum of ``Wl x_s`` over sources,
  concatenated across heads, plus a bias,
* a node with no incoming edges gets bias only (PyG aggregates nothing).

Dense masked attention maps straight onto the MXU/VPU: no scatter, no
dynamic edge lists, fully batchable.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class DenseGATv2Layer(nn.Module):
    out_features: int
    heads: int = 1
    negative_slope: float = 0.2
    dtype: jnp.dtype = jnp.float32
    block_cols: int = 0   # >0: chunk the target axis; bounds the
                          # [B,S,block,H,F] pre-activation workspace
    fused_logits: bool = True   # fuse the attention reduction so the
                                # [B,S,T,H,F] pre-activation never hits
                                # HBM (recomputed in backward); False =
                                # plain einsum (used by parity tests)

    @nn.compact
    def __call__(self, x: Array, adj: Array) -> Array:
        """x: [B, T, Fin], adj: [B, T, T] (adj[b, s, t] = edge s->t).
        Returns [B, T, heads * out_features]."""
        B, T, _ = x.shape
        H, F = self.heads, self.out_features
        xl = nn.Dense(H * F, name="lin_l", dtype=self.dtype)(x)
        xr = nn.Dense(H * F, name="lin_r", dtype=self.dtype)(x)
        xl = xl.reshape(B, T, H, F)
        xr = xr.reshape(B, T, H, F)
        # edge_dim=1: We maps the scalar weight to [H, F]
        we = self.param("lin_edge", nn.initializers.lecun_normal(),
                        (1, H * F), self.dtype).reshape(H, F)
        att = self.param("att", nn.initializers.lecun_normal(), (H, F),
                         self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (H * F,), self.dtype)

        ns = self.negative_slope

        def _logits(xl_: Array, xr_cols: Array, adj_cols: Array,
                    we_: Array, att_: Array) -> Array:
            """xl_ [B,S,H,F], xr_cols [B,C,H,F], adj_cols [B,S,C]
            -> [B, S, C, H]."""
            pre = (xl_[:, :, None, :, :] + xr_cols[:, None, :, :, :]
                   + adj_cols[:, :, :, None, None] * we_)
            act = nn.leaky_relu(pre, ns)
            if self.fused_logits:
                # elementwise-multiply + sum lets XLA fuse the whole chain
                # into one reduction loop: the [B,S,C,H,F] pre-activation
                # is never materialized in HBM (an einsum would route the
                # contraction to the MXU and force the materialization —
                # this op is bandwidth-bound, not FLOP-bound, so the VPU
                # reduction wins; measured in scripts/bench_gat.py)
                return jnp.sum(act * att_, axis=-1)
            return jnp.einsum("bschf,hf->bsch", act, att_)

        if self.fused_logits:
            # recompute (cheap) instead of saving the pre-activation for
            # the leaky_relu backward
            _logits = jax.checkpoint(_logits)

        def logits_for(adj_cols: Array, xr_cols: Array) -> Array:
            return _logits(xl, xr_cols, adj_cols.astype(self.dtype), we, att)

        if self.block_cols and self.block_cols < T:
            nb = -(-T // self.block_cols)
            pad = nb * self.block_cols - T
            adj_p = jnp.pad(adj, ((0, 0), (0, 0), (0, pad)))
            xr_p = jnp.pad(xr, ((0, 0), (0, pad), (0, 0), (0, 0)))
            adj_c = adj_p.reshape(B, T, nb, self.block_cols).transpose(2, 0, 1, 3)
            xr_c = xr_p.reshape(B, nb, self.block_cols, H, F).transpose(1, 0, 2, 3, 4)
            chunks = jax.lax.map(lambda c: logits_for(c[0], c[1]),
                                 (adj_c, xr_c))          # [nb, B, S, C, H]
            logits = chunks.transpose(1, 2, 0, 3, 4).reshape(B, T, nb * self.block_cols, H)
            logits = logits[:, :, :T]
        else:
            logits = logits_for(adj, xr)                 # [B, S, T, H]

        mask = (adj != 0)[:, :, :, None]                 # [B, S, T, 1]
        neg = jnp.asarray(-1e30, logits.dtype)
        logits = jnp.where(mask, logits, neg)
        logits = logits - jax.lax.stop_gradient(
            jnp.max(logits, axis=1, keepdims=True))
        w = jnp.where(mask, jnp.exp(logits), 0.0)
        denom = jnp.sum(w, axis=1, keepdims=True)        # over sources s
        alpha = w / jnp.where(denom == 0, 1.0, denom)

        out = jnp.einsum("bsth,bshf->bthf", alpha, xl)
        return out.reshape(B, T, H * F) + bias


class GATv2Stack(nn.Module):
    """[GATv2 -> LeakyReLU(0.01)] * len(hidden) -> GATv2 (no activation).

    Mirrors the reference ``graph_transitioner``
    (/root/reference/models/ct_mcq_vae.py:102-114): hidden widths come from
    ``latent_dims[1:]``, every layer has ``1 + action_dim`` heads, and the
    final layer maps back to ``input_dim`` per head.
    """

    input_dim: int
    hidden: Sequence[int]
    heads: int
    dtype: jnp.dtype = jnp.float32
    block_cols: int = 0

    @nn.compact
    def __call__(self, x: Array, adj: Array) -> Array:
        for dim in self.hidden:
            x = DenseGATv2Layer(dim, heads=self.heads, dtype=self.dtype,
                                block_cols=self.block_cols)(x, adj)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return DenseGATv2Layer(self.input_dim, heads=self.heads,
                               dtype=self.dtype,
                               block_cols=self.block_cols)(x, adj)
