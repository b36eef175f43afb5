"""Blocked dense-GATv2 attention must equal the unblocked path for every
block size (the workspace-bounding knob for large causal-variable counts,
analogous to the reference's comp/mem adjacency switch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctvae_tpu.ops.gat import DenseGATv2Layer


@pytest.mark.parametrize("block_cols", [1, 4, 5, 13, 64])
def test_blocked_gat_matches_dense(block_cols):
    B, T, Fin, H, F = 2, 13, 6, 3, 5
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, T, Fin)).astype(np.float32))
    adj = jnp.asarray(
        (rng.uniform(size=(B, T, T)) > 0.4).astype(np.float32)
        * rng.uniform(size=(B, T, T)).astype(np.float32))
    layer = DenseGATv2Layer(F, heads=H)
    variables = layer.init(jax.random.PRNGKey(0), x, adj)
    ref = layer.apply(variables, x, adj)
    out = DenseGATv2Layer(F, heads=H, block_cols=block_cols).apply(
        variables, x, adj)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_logits_matches_einsum():
    """The default fused-reduction logits path (pre-activation never
    materialized, recomputed in backward) must equal the plain einsum
    formulation in both outputs and gradients."""
    B, T, Fin, H, F = 2, 13, 6, 3, 5
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, T, Fin)).astype(np.float32))
    adj = jnp.asarray(
        (rng.uniform(size=(B, T, T)) > 0.4).astype(np.float32)
        * rng.uniform(size=(B, T, T)).astype(np.float32))
    fused = DenseGATv2Layer(F, heads=H, fused_logits=True)
    plain = DenseGATv2Layer(F, heads=H, fused_logits=False)
    variables = fused.init(jax.random.PRNGKey(0), x, adj)

    def loss(m, v):
        return jnp.sum(jnp.square(m.apply(v, x, adj)))

    np.testing.assert_allclose(np.asarray(fused.apply(variables, x, adj)),
                               np.asarray(plain.apply(variables, x, adj)),
                               rtol=1e-5, atol=1e-6)
    gf = jax.grad(lambda v: loss(fused, v))(variables)
    gp = jax.grad(lambda v: loss(plain, v))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_blocked_gat_gradients_match():
    B, T, Fin, H, F = 2, 9, 4, 2, 3
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, T, Fin)).astype(np.float32))
    adj = jnp.asarray(rng.uniform(size=(B, T, T)).astype(np.float32))
    layer = DenseGATv2Layer(F, heads=H)
    variables = layer.init(jax.random.PRNGKey(0), x, adj)

    def loss(v, blk):
        m = DenseGATv2Layer(F, heads=H, block_cols=blk)
        return jnp.sum(jnp.square(m.apply(v, x, adj)))

    g0 = jax.grad(lambda v: loss(v, 0))(variables)
    g4 = jax.grad(lambda v: loss(v, 4))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
