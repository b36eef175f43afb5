"""Dense GATv2 vs the real torch-geometric GATv2Conv semantics.

Ground truth is tests/pyg_fixture.py — a faithful torch implementation
of PyG v2.2's GATv2Conv (incl. the ``add_self_loops=True,
fill_value='mean'`` defaults the reference uses,
/root/reference/models/ct_mcq_vae.py:102-114) driven through the same
``dense_to_sparse`` edge-list path the reference runs. Weights are
transplanted into ctvae_tpu's dense masked-attention layer and outputs
compared on adversarial graphs: nonzero diagonals (must be *replaced*
by mean-filled self-loops, not used), isolated nodes (must still attend
to themselves), zero-outgoing support nodes, multi-head, batching."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import pyg_fixture as pyg  # noqa: E402
from ctvae_tpu.ops.gat import DenseGATv2Layer, GATv2Stack  # noqa: E402


def _transplant_layer(conv: "pyg.GATv2Conv") -> dict:
    """PyG GATv2Conv state -> DenseGATv2Layer params dict."""
    return {
        "lin_l": {"kernel": jnp.asarray(conv.lin_l.weight.detach().numpy().T),
                  "bias": jnp.asarray(conv.lin_l.bias.detach().numpy())},
        "lin_r": {"kernel": jnp.asarray(conv.lin_r.weight.detach().numpy().T),
                  "bias": jnp.asarray(conv.lin_r.bias.detach().numpy())},
        "lin_edge": jnp.asarray(conv.lin_edge.weight.detach().numpy().T),
        "att": jnp.asarray(conv.att.detach().numpy()[0]),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }


def _adversarial_adj(rng, B, T):
    """Batched adjacency with nonzero diagonal, isolated nodes, a
    zero-outgoing support-style node, and ~60% sparsity."""
    adj = rng.uniform(0.1, 1.0, size=(B, T, T)).astype(np.float32)
    adj *= (rng.uniform(size=(B, T, T)) < 0.4)
    for b in range(B):
        adj[b, np.arange(0, T, 3), np.arange(0, T, 3)] = \
            rng.uniform(0.5, 1.0, size=len(range(0, T, 3)))
        adj[b, :, 1] = 0.0          # node 1: no incoming edges at all
        adj[b, T - 1, :] = 0.0      # last node: no outgoing edges
        adj[b, :, T - 1] = 1.0      # ...but everyone feeds it (support)
    return adj


def _run_fixture(conv, x, adj):
    """Reference-style path: batched dense -> block-diagonal sparse."""
    B, T, Fin = x.shape
    with torch.no_grad():
        edge_index, edge_attr = pyg.dense_to_sparse(torch.from_numpy(adj))
        out = conv(torch.from_numpy(x.reshape(B * T, Fin)), edge_index,
                   edge_attr=edge_attr)
    return out.numpy().reshape(B, T, -1)


@pytest.mark.parametrize("heads", [1, 3])
def test_gatv2_layer_vs_pyg(heads):
    rng = np.random.default_rng(0)
    B, T, Fin, Fout = 3, 9, 6, 5
    torch.manual_seed(0)
    conv = pyg.GATv2Conv(Fin, Fout, heads=heads, edge_dim=1)
    conv.eval()

    x = rng.normal(size=(B, T, Fin)).astype(np.float32)
    adj = _adversarial_adj(rng, B, T)
    ref = _run_fixture(conv, x, adj)

    layer = DenseGATv2Layer(Fout, heads=heads, fused_logits=False)
    ours = layer.apply({"params": _transplant_layer(conv)},
                       jnp.asarray(x), jnp.asarray(adj))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-5)

    # fused-logits and blocked paths are numerically identical modes
    fused = DenseGATv2Layer(Fout, heads=heads, fused_logits=True)
    of = fused.apply({"params": _transplant_layer(conv)},
                     jnp.asarray(x), jnp.asarray(adj))
    np.testing.assert_allclose(np.asarray(of), ref, rtol=2e-4, atol=2e-5)
    blocked = DenseGATv2Layer(Fout, heads=heads, block_cols=4)
    ob = blocked.apply({"params": _transplant_layer(conv)},
                       jnp.asarray(x), jnp.asarray(adj))
    np.testing.assert_allclose(np.asarray(ob), ref, rtol=2e-4, atol=2e-5)


def test_gatv2_diagonal_is_replaced_not_used():
    """The diagonal's VALUE must not matter (PyG removes it before
    adding mean-filled self-loops): two adjacencies differing only in
    diagonal values produce identical outputs."""
    rng = np.random.default_rng(1)
    B, T, Fin, Fout = 2, 6, 4, 3
    torch.manual_seed(1)
    conv = pyg.GATv2Conv(Fin, Fout, heads=2, edge_dim=1)
    params = {"params": _transplant_layer(conv)}
    layer = DenseGATv2Layer(Fout, heads=2)

    x = rng.normal(size=(B, T, Fin)).astype(np.float32)
    adj = _adversarial_adj(rng, B, T)
    adj2 = adj.copy()
    for b in range(B):
        np.fill_diagonal(adj2[b], rng.uniform(0.1, 1.0, T))
    a = layer.apply(params, jnp.asarray(x), jnp.asarray(adj))
    b_ = layer.apply(params, jnp.asarray(x), jnp.asarray(adj2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)

    # and both match the fixture run on the second adjacency
    ref = _run_fixture(conv, x, adj2)
    np.testing.assert_allclose(np.asarray(b_), ref, rtol=2e-4, atol=2e-5)


def test_gatv2_stack_vs_pyg_sequential():
    """The reference's graph_transitioner shape: [GATv2 -> LeakyReLU]*2
    -> GATv2, every layer 1+A heads, hidden widths latent_dims[1:]
    (/root/reference/models/ct_mcq_vae.py:102-114)."""
    rng = np.random.default_rng(2)
    N, A = 5, 3
    heads = 1 + A
    hidden = [7, 4]
    B, T = 2, 8

    torch.manual_seed(2)
    mods, in_ch = [], N
    for dim in hidden:
        mods += [(pyg.GATv2Conv(in_ch, dim, edge_dim=1, heads=heads),
                  "x, edge_index, edge_attr -> x"),
                 torch.nn.LeakyReLU(inplace=True)]
        in_ch = dim * heads
    mods += [(pyg.GATv2Conv(in_ch, N, edge_dim=1, heads=heads),
              "x, edge_index, edge_attr -> x")]
    seq = pyg.Sequential("x, edge_index, edge_attr", mods)
    seq.eval()

    stack = GATv2Stack(input_dim=N, hidden=tuple(hidden), heads=heads)
    convs = [m for m in seq._mods if isinstance(m, pyg.GATv2Conv)]
    params = {f"DenseGATv2Layer_{i}": _transplant_layer(c)
              for i, c in enumerate(convs)}

    x = rng.normal(size=(B, T, N)).astype(np.float32)
    adj = _adversarial_adj(rng, B, T)
    B_, T_ = B, T
    with torch.no_grad():
        ei, ea = pyg.dense_to_sparse(torch.from_numpy(adj))
        ref = seq(torch.from_numpy(x.reshape(B_ * T_, N)), ei,
                  edge_attr=ea).numpy().reshape(B, T, -1)
    ours = stack.apply({"params": params}, jnp.asarray(x), jnp.asarray(adj))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=5e-4, atol=5e-5)


def test_identity_forward_matches_pyg_identity_adjacency():
    """The closed-form identity pass must equal the fixture run on an
    identity adjacency (self-edges removed -> zero-attr self-loops ->
    singleton softmax -> lin_l + bias)."""
    rng = np.random.default_rng(3)
    N, heads, B, T = 4, 3, 2, 6
    torch.manual_seed(3)
    conv = pyg.GATv2Conv(N, N, edge_dim=1, heads=heads)
    conv.eval()
    x = rng.normal(size=(B, T, N)).astype(np.float32)
    adj = np.stack([np.eye(T, dtype=np.float32)] * B)
    ref = _run_fixture(conv, x, adj)

    layer = DenseGATv2Layer(N, heads=heads)
    params = {"params": _transplant_layer(conv)}
    fast = layer.apply(params, jnp.asarray(x), method=layer.identity_call)
    np.testing.assert_allclose(np.asarray(fast), ref, rtol=2e-4, atol=2e-5)
    general = layer.apply(params, jnp.asarray(x), jnp.asarray(adj))
    np.testing.assert_allclose(np.asarray(general), ref, rtol=2e-4,
                               atol=2e-5)


def test_heads_call_matches_full_forward_values_and_grads():
    """heads_call / select_forward == __call__ restricted to the chosen
    heads, in values AND parameter gradients (heads are independent in
    GATv2: per-head logits, per-head incoming-softmax, per-head
    aggregation). This is the exactness contract the CT transition head
    relies on (models/ct_vae.py _compute_y final-layer head subset)."""
    rng = np.random.default_rng(0)
    B, T, FIN, H, F = 3, 9, 6, 5, 4
    x = jnp.asarray(rng.normal(size=(B, T, FIN)), jnp.float32)
    adj = jnp.asarray((rng.uniform(size=(B, T, T)) > 0.6)
                      * rng.uniform(size=(B, T, T)), jnp.float32)
    head_idx = jnp.asarray(rng.integers(0, H, (B, 2)), jnp.int32)

    layer = DenseGATv2Layer(out_features=F, heads=H)
    params = layer.init(jax.random.PRNGKey(0), x, adj)

    def full_then_gather(p):
        out = layer.apply(p, x, adj).reshape(B, T, H, F)
        return jnp.take_along_axis(out, head_idx[:, None, :, None], axis=2)

    def subset(p):
        return layer.apply(p, x, adj, head_idx, method=layer.heads_call)

    np.testing.assert_allclose(np.asarray(subset(params)),
                               np.asarray(full_then_gather(params)),
                               rtol=1e-6, atol=1e-6)
    g_full = jax.grad(lambda p: jnp.sum(full_then_gather(p) ** 2))(params)
    g_sub = jax.grad(lambda p: jnp.sum(subset(p) ** 2))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        g_full, g_sub)

    # and through the stack: final-layer subset == full stack + gather
    stack = GATv2Stack(input_dim=F, hidden=(7,), heads=H)
    sp = stack.init(jax.random.PRNGKey(1), x[..., :F] * 0 + 1.0, adj)
    xs = jnp.asarray(rng.normal(size=(B, T, F)), jnp.float32)
    full = stack.apply(sp, xs, adj).reshape(B, T, H, F)
    full = jnp.take_along_axis(full, head_idx[:, None, :, None], axis=2)
    sub = stack.apply(sp, xs, adj, head_idx, method=stack.select_forward)
    np.testing.assert_allclose(np.asarray(sub), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("variant", ["block_cols", "einsum"])
def test_heads_call_honors_layer_options(variant):
    """heads_call stays exact under the chunked-workspace (block_cols)
    and non-fused einsum (fused_logits=False) configurations."""
    rng = np.random.default_rng(7)
    B, T, H, F = 2, 8, 4, 3
    x = jnp.asarray(rng.normal(size=(B, T, F)), jnp.float32)
    adj = jnp.asarray((rng.uniform(size=(B, T, T)) > 0.5)
                      * rng.uniform(size=(B, T, T)), jnp.float32)
    head_idx = jnp.asarray(rng.integers(0, H, (B, 2)), jnp.int32)
    kw = ({"block_cols": 3} if variant == "block_cols"
          else {"fused_logits": False})
    layer = DenseGATv2Layer(out_features=F, heads=H, **kw)
    ref_layer = DenseGATv2Layer(out_features=F, heads=H)
    params = layer.init(jax.random.PRNGKey(2), x, adj)
    full = ref_layer.apply(params, x, adj).reshape(B, T, H, F)
    full = jnp.take_along_axis(full, head_idx[:, None, :, None], axis=2)
    sub = layer.apply(params, x, adj, head_idx, method=layer.heads_call)
    np.testing.assert_allclose(np.asarray(sub), np.asarray(full),
                               rtol=1e-5, atol=1e-6)
