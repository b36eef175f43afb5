"""A faithful, self-written torch implementation of the torch-geometric
v2.2 ops the reference uses — ``GATv2Conv`` (with ``edge_dim``,
``add_self_loops=True``, ``fill_value='mean'`` defaults),
``dense_to_sparse`` (2-D and batched 3-D), and ``gnn.Sequential`` — so
the reference's real ``_compute_y`` GNN path
(/root/reference/models/ct_mcq_vae.py:102-114, :188-228) can run as
ground truth without the (unavailable) torch-geometric CUDA wheels.

Semantics implemented from the GATv2 paper (Brody et al. 2022) and
PyG's documented behavior:

* ``dense_to_sparse(adj)``: nonzero entries become edges
  ``row -> col`` with the entry value as a 1-dim edge attr; a 3-D
  input is treated as a block-diagonal batch (node ids offset by
  ``batch * N``).
* ``GATv2Conv.forward``: per head ``e = leaky_relu(Wl x_src + Wr x_dst
  + We edge_attr)``, logits ``(e * att).sum(-1)``, softmax over the
  *incoming* edges of each target, output ``sum alpha * Wl x_src``
  concat across heads plus bias.
* ``add_self_loops=True`` (the default, used by the reference):
  existing self-loops are REMOVED first, then one self-loop per node is
  appended whose edge attr is the scatter-mean of the node's remaining
  incoming edge attrs (0 for nodes with no other incoming edges).
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


def dense_to_sparse(adj):
    idx = adj.nonzero(as_tuple=False).t()
    if adj.dim() == 2:
        edge_index = idx
        edge_attr = adj[idx[0], idx[1]]
    else:
        edge_attr = adj[idx[0], idx[1], idx[2]]
        offset = idx[0] * adj.size(-1)
        edge_index = idx[1:] + offset
    return edge_index, edge_attr


def remove_self_loops(edge_index, edge_attr=None):
    keep = edge_index[0] != edge_index[1]
    edge_index = edge_index[:, keep]
    if edge_attr is not None:
        edge_attr = edge_attr[keep]
    return edge_index, edge_attr


def add_self_loops(edge_index, edge_attr=None, fill_value="mean",
                   num_nodes=None):
    N = int(num_nodes)
    loops = torch.arange(N, device=edge_index.device)
    loop_index = torch.stack([loops, loops])
    out_index = torch.cat([edge_index, loop_index], dim=1)
    if edge_attr is None:
        return out_index, None
    assert fill_value == "mean"
    # scatter-mean of incoming edge attrs by target node
    tgt = edge_index[1]
    shape = (N,) + edge_attr.shape[1:]
    total = torch.zeros(shape, dtype=edge_attr.dtype).index_add_(
        0, tgt, edge_attr)
    count = torch.zeros(N, dtype=edge_attr.dtype).index_add_(
        0, tgt, torch.ones_like(tgt, dtype=edge_attr.dtype))
    count = count.clamp(min=1)
    loop_attr = total / count.view((N,) + (1,) * (edge_attr.dim() - 1))
    return out_index, torch.cat([edge_attr, loop_attr], dim=0)


def scatter_softmax(src, index, num_nodes):
    """Softmax of ``src`` [E, H] grouped by ``index`` [E] (targets)."""
    H = src.size(-1)
    big = torch.full((num_nodes, H), float("-inf"), dtype=src.dtype)
    group_max = big.scatter_reduce(0, index.unsqueeze(-1).expand_as(src),
                                   src, reduce="amax",
                                   include_self=True)[index]
    out = (src - group_max).exp()
    denom = torch.zeros(num_nodes, H, dtype=src.dtype).index_add_(
        0, index, out)[index]
    return out / denom.clamp(min=1e-16)


def _glorot(t):
    if t is not None:
        stdv = math.sqrt(6.0 / (t.size(-2) + t.size(-1)))
        t.data.uniform_(-stdv, stdv)


class GATv2Conv(nn.Module):

    def __init__(self, in_channels, out_channels, heads=1, concat=True,
                 negative_slope=0.2, dropout=0.0, add_self_loops=True,
                 edge_dim=None, fill_value="mean", bias=True,
                 share_weights=False):
        super().__init__()
        self.out_channels = out_channels
        self.heads = heads
        self.concat = concat
        self.negative_slope = negative_slope
        self.dropout = dropout
        self.add_self_loops = add_self_loops
        self.fill_value = fill_value

        self.lin_l = nn.Linear(in_channels, heads * out_channels, bias=bias)
        if share_weights:
            self.lin_r = self.lin_l
        else:
            self.lin_r = nn.Linear(in_channels, heads * out_channels,
                                   bias=bias)
        self.lin_edge = None
        if edge_dim is not None:
            self.lin_edge = nn.Linear(edge_dim, heads * out_channels,
                                      bias=False)
        self.att = nn.Parameter(torch.empty(1, heads, out_channels))
        self.bias = None
        if bias:
            self.bias = nn.Parameter(torch.zeros(
                heads * out_channels if concat else out_channels))
        _glorot(self.lin_l.weight)
        _glorot(self.lin_r.weight)
        if self.lin_edge is not None:
            _glorot(self.lin_edge.weight)
        _glorot(self.att)

    def forward(self, x, edge_index, edge_attr=None):
        N, H, C = x.size(0), self.heads, self.out_channels
        x_l = self.lin_l(x).view(N, H, C)
        x_r = self.lin_r(x).view(N, H, C)

        if self.add_self_loops:
            edge_index, edge_attr = remove_self_loops(edge_index, edge_attr)
            edge_index, edge_attr = add_self_loops(
                edge_index, edge_attr, fill_value=self.fill_value,
                num_nodes=N)

        src, dst = edge_index[0], edge_index[1]
        e = x_l[src] + x_r[dst]                          # [E, H, C]
        if self.lin_edge is not None and edge_attr is not None:
            ea = edge_attr.view(-1, 1) if edge_attr.dim() == 1 else edge_attr
            e = e + self.lin_edge(ea).view(-1, H, C)
        e = F.leaky_relu(e, self.negative_slope)
        alpha = (e * self.att).sum(dim=-1)               # [E, H]
        alpha = scatter_softmax(alpha, dst, N)
        alpha = F.dropout(alpha, p=self.dropout, training=self.training)

        out = torch.zeros(N, H, C, dtype=x.dtype).index_add_(
            0, dst, x_l[src] * alpha.unsqueeze(-1))
        out = out.view(N, H * C) if self.concat else out.mean(dim=1)
        if self.bias is not None:
            out = out + self.bias
        return out


GATConv = GATv2Conv  # the reference imports gnn but only uses GATv2Conv


class Sequential(nn.Module):
    """gnn.Sequential('x, edge_index, edge_attr', [(mod, 'sig -> x') |
    mod, ...]) — just enough of PyG's signature-routed container."""

    def __init__(self, signature, modules):
        super().__init__()
        self._entries = []
        self._mods = nn.ModuleList()
        for entry in modules:
            if isinstance(entry, tuple):
                mod, sig = entry
                takes_graph = "edge_index" in sig
            else:
                mod, takes_graph = entry, False
            self._mods.append(mod)
            self._entries.append(takes_graph)

    def forward(self, x, edge_index, edge_attr=None):
        for mod, takes_graph in zip(self._mods, self._entries):
            if takes_graph:
                x = mod(x, edge_index, edge_attr=edge_attr)
            else:
                x = mod(x)
        return x
