"""Dense GATv2 attention over weighted adjacency matrices — the TPU-native
replacement for the reference's sparse torch-geometric pipeline
(``dense_to_sparse`` + GATv2Conv stack, /root/reference/models/ct_mcq_vae.py:102-114,
:211-214).

Semantics matched to torch-geometric's GATv2Conv (v2.2, edge_dim=1,
share_weights=False, concat=True, negative_slope=0.2, and the defaults
``add_self_loops=True, fill_value='mean'`` the reference construction
uses):

* an entry ``adj[s, t] != 0`` is a directed edge s -> t carrying its value
  as a 1-dim edge feature,
* **self-loop replacement** (PyG's default, applied inside every layer):
  the adjacency's own diagonal edges are REMOVED, then one self-loop per
  node is added whose edge attr is the mean of that node's remaining
  incoming edge weights (0 for nodes with no other incoming edges) — so
  every node attends at least to itself,
* per head h: ``e[s,t,h] = a_h . leaky_relu(Wl x_s + Wr x_t + We w_st)``,
* attention is a softmax over the *incoming* edges of t only (non-edges
  are excluded, exactly like the sparse edge list — not merely masked
  post-softmax),
* node t's output is the alpha-weighted sum of ``Wl x_s`` over sources,
  concatenated across heads, plus a bias.

Pinned against a faithful torch implementation of PyG's op in
tests/test_gat_vs_pyg.py and, through the reference's full
``_compute_y``, in tests/test_ct_reference_parity.py.

Dense masked attention maps straight onto the MXU/VPU: no scatter, no
dynamic edge lists, fully batchable.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..parallel.mesh import shard_dim
from .gat_flash import flash_gat

Array = jax.Array


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_gat_logits(xl: Array, xr: Array, adj: Array,
                     we: Array, att: Array, ns: float) -> Array:
    """GATv2 edge logits ``e[b,s,t,h] = att_h . leaky(xl_s + xr_t +
    adj_st we_h)`` with a hand-written ONE-WALK backward.

    ``jax.checkpoint`` around the same expression recomputes the
    [B,S,T,H,F] pre-activation once per gradient reduction — XLA emits
    ~4 separate loop fusions over the full domain (profiled in
    scripts/profile_ct.py; they dominate the CT causal step). Here the
    backward is a single traced computation producing all five
    gradients from one recomputation, which XLA multi-output-fuses into
    far fewer domain walks. Values and gradients are identical to the
    checkpointed form (same ops, same dtypes) — pinned in
    tests/test_gat_flash.py; A/B-measured on chip in
    scripts/bench_gat_flash.py.

    xl [B,S,H,F], xr [B,T,H,F], adj [B,S,T], we/att [H,F] (or [B,H,F]
    for per-sample heads — every op broadcasts). Returns [B,S,T,H].
    """
    pre = (xl[:, :, None, :, :] + xr[:, None, :, :, :]
           + adj[:, :, :, None, None] * _bhf(we))
    act = jnp.where(pre >= 0, pre, ns * pre)
    return jnp.sum(act * _bhf(att), axis=-1)


def _bhf(p: Array) -> Array:
    """[H,F] -> [1,1,H,F] or [B,H,F] -> [B,1,1,H,F] for broadcasting
    against the [B,S,T,H,F] pre-activation."""
    return p[:, None, None] if p.ndim == 3 else p


def _fgl_fwd(xl, xr, adj, we, att, ns):
    return fused_gat_logits(xl, xr, adj, we, att, ns), (xl, xr, adj, we, att)


def _fgl_bwd(ns, res, d_e):
    xl, xr, adj, we, att = res
    web, attb = _bhf(we), _bhf(att)
    pre = (xl[:, :, None, :, :] + xr[:, None, :, :, :]
           + adj[:, :, :, None, None] * web)
    slope = jnp.where(pre >= 0, jnp.asarray(1.0, pre.dtype),
                      jnp.asarray(ns, pre.dtype))
    dpre = d_e[..., None] * attb * slope                 # [B,S,T,H,F]
    act = jnp.where(pre >= 0, pre, ns * pre)
    d_xl = jnp.sum(dpre, axis=2)                         # [B,S,H,F]
    d_xr = jnp.sum(dpre, axis=1)                         # [B,T,H,F]
    d_adj = jnp.sum(dpre * web, axis=(3, 4))             # [B,S,T]
    p_axes = (1, 2) if we.ndim == 3 else (0, 1, 2)
    d_we = jnp.sum(dpre * adj[:, :, :, None, None], axis=p_axes)
    d_att = jnp.sum(act * d_e[..., None], axis=p_axes)
    return d_xl, d_xr, d_adj, d_we, d_att


fused_gat_logits.defvjp(_fgl_fwd, _fgl_bwd)


import contextlib as _contextlib
import threading as _threading

_flash_scope_state = _threading.local()


@_contextlib.contextmanager
def flash_scope():
    """Marks a trace region where the flash-fused attention kernel is
    measured to WIN (the CT causal/transition path: +15% full-step
    throughput on v5e vs the XLA formulation, while the action/base
    steps measure ~12% SLOWER under the kernel — scripts/
    bench_gat_flash.py and the mode A/B in PARITY.md). Under
    CTVAE_FLASH_GAT=auto (the default), ``_use_flash`` consults this
    scope so each jitted step mode bakes in its own best path. Tracing
    happens inside the context, and the per-mode train-step caches key
    the compiled graphs, so the choice is stable per mode. Reentrant:
    the prior flag value is restored on exit (token save/restore), so
    nesting or enclosing scopes survive."""
    prev = getattr(_flash_scope_state, "on", False)
    _flash_scope_state.on = True
    try:
        yield
    finally:
        _flash_scope_state.on = prev


@_contextlib.contextmanager
def force_xla_scope():
    """Thread-local override that pins ``_use_flash`` to False for any
    trace inside the context — beats every CTVAE_FLASH_GAT setting.
    Used by serving/export.py: an exported artifact must stay
    backend-portable (a baked-in pallas_call would not lower for the
    artifact's cpu platform), and mutating process-global os.environ
    around export would race a train step being traced concurrently on
    another thread. Reentrant (token save/restore)."""
    prev = getattr(_flash_scope_state, "force_xla", False)
    _flash_scope_state.force_xla = True
    try:
        yield
    finally:
        _flash_scope_state.force_xla = prev


def _in_flash_scope() -> bool:
    return bool(getattr(_flash_scope_state, "on", False))


def _in_force_xla_scope() -> bool:
    return bool(getattr(_flash_scope_state, "force_xla", False))


def _onewalk_enabled() -> bool:
    """CTVAE_GAT_ONEWALK routes the fused-logit backward through the
    one-walk custom VJP above instead of ``jax.checkpoint`` recompute.
    Default on — measured faster on v5e (scripts/bench_gat_flash.py);
    0 restores the checkpointed form (bit-identical values/grads)."""
    return os.environ.get("CTVAE_GAT_ONEWALK", "1") != "0"


class DenseGATv2Layer(nn.Module):
    out_features: int
    heads: int = 1
    negative_slope: float = 0.2
    add_self_loops: bool = True  # PyG default: replace diagonal edges
                                 # with mean-filled self-loops
    dtype: jnp.dtype = jnp.float32
    block_cols: int = 0   # >0: chunk the target axis; bounds the
                          # [B,S,block,H,F] pre-activation workspace
    fused_logits: bool = True   # fuse the attention reduction so the
                                # [B,S,T,H,F] pre-activation never hits
                                # HBM (recomputed in backward); False =
                                # plain einsum (used by parity tests)
    seq_axis: Optional[str] = None  # mesh axis to shard the TARGET node
                                # axis of the attention domain over
                                # (sequence parallelism — see
                                # parallel/mesh.py shard_dim). No-op
                                # outside a mesh context.

    def setup(self):
        # setup() (not @nn.compact) so identity_call can share the params
        H, F = self.heads, self.out_features
        self.lin_l = nn.Dense(H * F, dtype=self.dtype)
        self.lin_r = nn.Dense(H * F, dtype=self.dtype)
        # edge_dim=1: We maps the scalar weight to [H, F]
        self.we = self.param("lin_edge", nn.initializers.lecun_normal(),
                             (1, H * F), self.dtype)
        self.att = self.param("att", nn.initializers.lecun_normal(), (H, F),
                              self.dtype)
        self.bias = self.param("bias", nn.initializers.zeros, (H * F,),
                               self.dtype)

    def _replace_self_loops(self, adj: Array):
        """PyG ``remove_self_loops`` + ``add_self_loops(fill_value='mean')``
        (when enabled): drop diagonal edges, then give EVERY node a
        self-loop whose edge attr is the mean of its remaining incoming
        weights. Returns ``(adj, edge_mask)`` — shared by ``__call__``
        and ``heads_call`` so the semantics live in exactly one place."""
        if not self.add_self_loops:
            return adj, adj != 0
        T = adj.shape[1]
        eye = jnp.eye(T, dtype=bool)[None]
        off = jnp.where(eye, 0, adj)
        cnt = jnp.sum(off != 0, axis=1)                       # [B, T]
        fill = jnp.sum(off, axis=1) / jnp.maximum(cnt, 1)
        adj = off + eye * fill[:, None, :].astype(adj.dtype)
        return adj, (off != 0) | eye                          # [B, S, T]

    @staticmethod
    def _masked_incoming_softmax(logits: Array, edge_mask: Array) -> Array:
        """Softmax over the source axis (1) restricted to real edges —
        non-edges are excluded exactly like a sparse edge list, and
        targets with no incoming edges get an all-zero row. logits
        [B, S, T, H']; edge_mask [B, S, T]."""
        mask = edge_mask[:, :, :, None]                  # [B, S, T, 1]
        neg = jnp.asarray(-1e30, logits.dtype)
        logits = jnp.where(mask, logits, neg)
        logits = logits - jax.lax.stop_gradient(
            jnp.max(logits, axis=1, keepdims=True))
        w = jnp.where(mask, jnp.exp(logits), 0.0)
        denom = jnp.sum(w, axis=1, keepdims=True)        # over sources s
        return w / jnp.where(denom == 0, 1.0, denom)

    def identity_call(self, x: Array) -> Array:
        """Exact fast path for an identity adjacency. Under PyG
        semantics the diagonal edges are removed and replaced by one
        mean-filled self-loop per node (attr 0 here — no other incoming
        edges), so each target still has exactly ONE incoming edge: the
        softmax over a singleton is identically 1 — independent of the
        logits, so no value OR gradient flows through lin_r / att /
        lin_edge — and the layer collapses to ``lin_l(x) + bias``.
        O(T F^2 H) instead of O(T^2 H F)."""
        return self.lin_l(x) + self.bias

    def _use_flash(self) -> bool:
        """Route the attention through the flash-fused Pallas kernel
        (ops/gat_flash.py): CTVAE_FLASH_GAT=1 forces it on any backend
        (CPU runs the interpreter — tests); "auto" (the default) uses
        it on ANY TPU backend — with the v2 lane-packed kernel and the
        Tc=24 chunk default the full train step wins in every CT mode
        (BENCH_r05: causal 1.74×, action 1.07×, base 1.09× vs the XLA
        formulation; round-4's action/base wash is gone). "scope"
        restores the round-4 causal-only policy (flash only inside
        ``flash_scope()``); 0 disables everywhere. Incompatible with
        the chunked-workspace mode (the kernel holds one [S,T,F]
        head-block in VMEM by construction), with sequence parallelism
        (the kernel grid owns the full target axis per program; SP
        splits that domain across chips on the XLA path instead), and
        pointless without fused_logits (parity tests pin the einsum
        path)."""
        if not self.fused_logits or self.block_cols or self.seq_axis:
            return False
        if _in_force_xla_scope():   # export pins the portable XLA path
            return False
        v = os.environ.get("CTVAE_FLASH_GAT", "auto")
        if v == "1":
            return True
        if v == "scope":
            return _in_flash_scope() and jax.default_backend() == "tpu"
        return v == "auto" and jax.default_backend() == "tpu"

    def __call__(self, x: Array, adj: Array) -> Array:
        """x: [B, T, Fin], adj: [B, T, T] (adj[b, s, t] = edge s->t).
        Returns [B, T, heads * out_features]."""
        B, T, _ = x.shape
        H, F = self.heads, self.out_features

        adj, edge_mask = self._replace_self_loops(adj)
        xl = self.lin_l(x).reshape(B, T, H, F)
        xr = self.lin_r(x).reshape(B, T, H, F)
        we = self.we.reshape(H, F)
        att = self.att
        bias = self.bias

        if self._use_flash():
            out = flash_gat(xl, xr, adj.astype(self.dtype), edge_mask,
                            we, att, self.negative_slope,
                            jax.default_backend() != "tpu")
            return out.reshape(B, T, H * F) + bias

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
            if _onewalk_enabled():
                # one-walk custom-VJP backward (see fused_gat_logits)
                def _logits(xl_, xr_cols, adj_cols, we_, att_):
                    return fused_gat_logits(xl_, xr_cols, adj_cols,
                                            we_, att_, ns)
            else:
                # recompute (cheap) instead of saving the pre-activation
                # for the leaky_relu backward
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
            # sequence parallelism: pin the target axis to the model mesh
            # axis so XLA partitions the O(B S T H F) logit fusion (and
            # its backward) across chips; each chip walks its T-block
            # against the full (small) source features. The blocked path
            # above already bounds the workspace a different way and is
            # left unsharded.
            logits = shard_dim(logits, 2, self.seq_axis)

        alpha = self._masked_incoming_softmax(logits, edge_mask)
        out = jnp.einsum("bsth,bshf->bthf", alpha, xl)
        out = shard_dim(out, 1, self.seq_axis)
        return out.reshape(B, T, H * F) + bias

    def heads_call(self, x: Array, adj: Array, head_idx: Array) -> Array:
        """Per-sample head-subset forward. GATv2 heads are independent
        (per-head logits, per-head softmax over incoming edges, per-head
        aggregation), so restricting computation to ``head_idx`` [B, K]
        is identical — values AND gradients — to ``__call__`` followed by
        gathering those heads, at K/H of the attention-domain VPU work.
        Used by the CT transition head, which keeps only head 0 and the
        per-sample action head of its FINAL layer (models/ct_vae.py
        ``_compute_y``; reference head-select at ct_mcq_vae.py:224-226).
        Returns [B, T, K, F] (heads not concatenated)."""
        B, T, _ = x.shape
        H, F = self.heads, self.out_features

        if self.block_cols and self.block_cols < T:
            # the chunked-workspace configuration exists to BOUND memory
            # (gat_block_cols, models/ct_vae.py): keep that bound by
            # routing through __call__'s lax.map chunking and gathering
            # the heads from its output, instead of the subset fast path
            # (which materializes the [B, S, T, K] logits unchunked).
            out = self(x, adj).reshape(B, T, H, F)
            return jnp.take_along_axis(out, head_idx[:, None, :, None],
                                       axis=2)

        adj, edge_mask = self._replace_self_loops(adj)

        # full projections (cheap MXU work), then per-sample head gather —
        # the savings target is the O(B*S*T*K*F) logits domain below
        hsel = head_idx[:, None, :, None]                       # [B,1,K,1]
        xl = jnp.take_along_axis(self.lin_l(x).reshape(B, T, H, F),
                                 hsel, axis=2)                  # [B,T,K,F]
        xr = jnp.take_along_axis(self.lin_r(x).reshape(B, T, H, F),
                                 hsel, axis=2)
        we = self.we.reshape(H, F)[head_idx]                    # [B,K,F]
        att = self.att[head_idx]                                # [B,K,F]
        bias = self.bias.reshape(H, F)[head_idx]                # [B,K,F]
        ns = self.negative_slope

        def _logits(xl_, xr_, adj_, we_, att_):
            pre = (xl_[:, :, None, :, :] + xr_[:, None, :, :, :]
                   + adj_[:, :, :, None, None] * we_[:, None, None, :, :])
            act = nn.leaky_relu(pre, ns)
            if self.fused_logits:
                return jnp.sum(act * att_[:, None, None, :, :], axis=-1)
            return jnp.einsum("bstkf,bkf->bstk", act, att_)

        if self.fused_logits:
            if _onewalk_enabled():
                # one-walk custom-VJP backward; we/att are per-sample
                # [B,K,F] here — fused_gat_logits broadcasts them
                def _logits(xl_, xr_, adj_, we_, att_):
                    return fused_gat_logits(xl_, xr_, adj_, we_, att_, ns)
            else:
                # recompute (cheap) instead of saving the pre-activation
                # for the leaky_relu backward — same policy as __call__
                _logits = jax.checkpoint(_logits)

        logits = _logits(xl, xr, adj.astype(self.dtype), we, att)
        logits = shard_dim(logits, 2, self.seq_axis)   # SP: see __call__
        alpha = self._masked_incoming_softmax(logits, edge_mask)
        out = jnp.einsum("bstk,bskf->btkf", alpha, xl)
        out = shard_dim(out, 1, self.seq_axis)
        return out + bias[:, None]


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
    seq_axis: Optional[str] = None   # sequence parallelism, per layer

    def setup(self):
        # attribute names keep the historical auto-generated paths
        # (DenseGATv2Layer_0, _1, ...) so checkpoints stay loadable
        dims = list(self.hidden) + [self.input_dim]
        for i, dim in enumerate(dims):
            setattr(self, f"DenseGATv2Layer_{i}",
                    DenseGATv2Layer(dim, heads=self.heads, dtype=self.dtype,
                                    block_cols=self.block_cols,
                                    seq_axis=self.seq_axis))
        self._n_layers = len(dims)

    def _layers(self):
        return [getattr(self, f"DenseGATv2Layer_{i}")
                for i in range(self._n_layers)]

    def __call__(self, x: Array, adj: Array) -> Array:
        *hidden_layers, last = self._layers()
        for layer in hidden_layers:
            x = nn.leaky_relu(layer(x, adj), negative_slope=0.01)
        return last(x, adj)

    def select_forward(self, x: Array, adj: Array,
                       head_idx: Array) -> Array:
        """Full stack, but the FINAL layer computes only the per-sample
        ``head_idx`` [B, K] heads (exact — see heads_call). Hidden
        layers still need every head: their concatenated output is the
        next layer's input. Returns [B, T, K, out_features]."""
        *hidden_layers, last = self._layers()
        for layer in hidden_layers:
            x = nn.leaky_relu(layer(x, adj), negative_slope=0.01)
        return last.heads_call(x, adj, head_idx)

    def identity_forward(self, x: Array) -> Array:
        """The stack under an identity adjacency (see
        DenseGATv2Layer.identity_call): exact, with no support nodes
        needed — they have no outgoing edges, so variable outputs never
        depend on them."""
        *hidden_layers, last = self._layers()
        for layer in hidden_layers:
            x = nn.leaky_relu(layer.identity_call(x), negative_slope=0.01)
        return last.identity_call(x)
