"""Flash-fused Pallas GATv2 kernel (ops/gat_flash.py) vs the layer's XLA
path — values AND parameter/input gradients, including edgeless-target
columns, through the real DenseGATv2Layer module (interpret mode on the
CPU mesh; the on-chip measurement lives in scripts/bench_gat.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctvae_tpu.ops.gat import DenseGATv2Layer
from ctvae_tpu.ops.gat_flash import flash_gat


def _layer_and_inputs(heads=5, out_features=12, fin=7, B=3, T=11, seed=0):
    layer = DenseGATv2Layer(out_features, heads=heads)
    k = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k[0], (B, T, fin), jnp.float32)
    adj = jnp.where(jax.random.uniform(k[1], (B, T, T)) > 0.55,
                    jax.random.uniform(k[2], (B, T, T)), 0.0)
    adj = adj.at[:, :, 4].set(0.0)      # a target with no incoming edges
    variables = layer.init(jax.random.PRNGKey(1), x, adj)
    return layer, variables, x, adj


def test_flash_gat_matches_layer_values_and_grads(monkeypatch):
    layer, variables, x, adj = _layer_and_inputs()

    def run(params, x, adj):
        return layer.apply({"params": params}, x, adj)

    def loss(params, x, adj):
        return jnp.sum(jnp.sin(run(params, x, adj)))

    monkeypatch.setenv("CTVAE_FLASH_GAT", "0")
    out_xla = run(variables["params"], x, adj)
    g_xla = jax.grad(loss, argnums=(0, 1, 2))(variables["params"], x, adj)

    monkeypatch.setenv("CTVAE_FLASH_GAT", "1")
    out_fl = run(variables["params"], x, adj)
    g_fl = jax.grad(loss, argnums=(0, 1, 2))(variables["params"], x, adj)

    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_fl),
                               rtol=2e-5, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_xla),
                    jax.tree_util.tree_leaves(g_fl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_flash_gat_multichunk_padded_grads(monkeypatch):
    """T=37 > the 16-column chunk (multi-chunk accumulation path) with
    odd S=T=37 (the sublane-padding path) — exactly the CT causal
    shapes' structure. Gradients must match the XLA path."""
    layer, variables, x, adj = _layer_and_inputs(heads=3, out_features=6,
                                                 fin=5, B=2, T=37, seed=3)

    def loss(params, x, adj):
        return jnp.sum(jnp.sin(layer.apply({"params": params}, x, adj)))

    monkeypatch.setenv("CTVAE_FLASH_GAT", "0")
    out_xla = layer.apply({"params": variables["params"]}, x, adj)
    g_xla = jax.grad(loss, argnums=(0, 1, 2))(variables["params"], x, adj)
    monkeypatch.setenv("CTVAE_FLASH_GAT", "1")
    monkeypatch.setenv("CTVAE_FLASH_TC", "16")
    out_fl = layer.apply({"params": variables["params"]}, x, adj)
    g_fl = jax.grad(loss, argnums=(0, 1, 2))(variables["params"], x, adj)

    np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_fl),
                               rtol=2e-5, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_xla),
                    jax.tree_util.tree_leaves(g_fl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_flash_gat_raw_op_edge_cases():
    """Direct op: all-zero adjacency (every target edgeless after the
    wrapper masks) and a fully-dense one."""
    B, S, H, F = 2, 6, 3, 8
    k = jax.random.split(jax.random.PRNGKey(2), 4)
    xl = jax.random.normal(k[0], (B, S, H, F), jnp.float32)
    xr = jax.random.normal(k[1], (B, S, H, F), jnp.float32)
    we = jax.random.normal(k[2], (H, F)) * 0.3
    att = jax.random.normal(k[3], (H, F)) * 0.3

    zero = jnp.zeros((B, S, S))
    out = flash_gat(xl, xr, zero, zero != 0, we, att, 0.2, True)
    np.testing.assert_array_equal(np.asarray(out), 0.0)

    dense = jnp.ones((B, S, S))
    out = flash_gat(xl, xr, dense, dense != 0, we, att, 0.2, True)
    # every column is a softmax-weighted mean of xl rows: bounded by them
    assert np.isfinite(np.asarray(out)).all()
    lo = np.asarray(jnp.min(xl, axis=1, keepdims=True))
    hi = np.asarray(jnp.max(xl, axis=1, keepdims=True))
    got = np.asarray(out)
    assert (got >= lo - 1e-5).all() and (got <= hi + 1e-5).all()


def test_onewalk_logits_match_checkpoint_path(monkeypatch):
    """CTVAE_GAT_ONEWALK (one-walk custom-VJP backward for the fused
    GAT logits) is value- and gradient-identical to the checkpointed
    recompute form, through __call__ AND the per-sample heads_call."""
    layer, variables, x, adj = _layer_and_inputs(seed=7)
    hidx = jnp.array([[0, 2], [0, 4], [0, 1]])           # [B, K=2]

    def loss_call(params, x, adj):
        out = layer.apply({"params": params}, x, adj)
        return jnp.sum(jnp.sin(out))

    def loss_heads(params, x, adj):
        out = layer.apply({"params": params}, x, adj, hidx,
                          method=DenseGATv2Layer.heads_call)
        return jnp.sum(jnp.cos(out))

    got = {}
    for env in ("0", "1"):
        monkeypatch.setenv("CTVAE_GAT_ONEWALK", env)
        monkeypatch.setenv("CTVAE_FLASH_GAT", "0")
        got[env] = [
            layer.apply({"params": variables["params"]}, x, adj),
            jax.grad(loss_call, argnums=(0, 1, 2))(
                variables["params"], x, adj),
            jax.grad(loss_heads, argnums=(0, 1, 2))(
                variables["params"], x, adj),
        ]
    for a, b in zip(jax.tree_util.tree_leaves(got["0"]),
                    jax.tree_util.tree_leaves(got["1"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_flash_gat_bf16_close_to_f32():
    """bf16 inputs (the model's training dtype) stay within bf16 noise
    of the f32 computation — the kernel upcasts internally."""
    layer, variables, x, adj = _layer_and_inputs(seed=3)
    os.environ["CTVAE_FLASH_GAT"] = "1"
    try:
        layer16 = DenseGATv2Layer(layer.out_features, heads=layer.heads,
                                  dtype=jnp.bfloat16)
        out16 = layer16.apply({"params": variables["params"]}, x, adj)
        out32 = layer.apply({"params": variables["params"]}, x, adj)
        np.testing.assert_allclose(np.asarray(out16, np.float32),
                                   np.asarray(out32), rtol=3e-2, atol=3e-2)
    finally:
        os.environ.pop("CTVAE_FLASH_GAT", None)


def test_flash_auto_gating_scope(monkeypatch):
    """CTVAE_FLASH_GAT=auto (default) routes through the kernel ONLY
    inside flash_scope() (the causal path) AND on a TPU backend —
    action/base steps keep the measured-faster XLA formulation."""
    import jax as _jax

    from ctvae_tpu.ops import gat as gat_mod

    layer = gat_mod.DenseGATv2Layer(8, heads=2)
    monkeypatch.delenv("CTVAE_FLASH_GAT", raising=False)
    # CPU backend: never flash under auto, scope or not
    assert not layer._use_flash()
    with gat_mod.flash_scope():
        assert not layer._use_flash()
    # pretend-TPU backend: flash only inside the scope
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    assert not layer._use_flash()
    with gat_mod.flash_scope():
        assert layer._use_flash()
    assert not layer._use_flash()   # scope restored on exit
    # explicit off wins everywhere
    monkeypatch.setenv("CTVAE_FLASH_GAT", "0")
    with gat_mod.flash_scope():
        assert not layer._use_flash()
    # force-on wins everywhere (tests run the interpreter on CPU)
    monkeypatch.setenv("CTVAE_FLASH_GAT", "1")
    assert layer._use_flash()
