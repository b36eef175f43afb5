"""Flash-fused pairwise kernel (ops/pairwise_flash.py) vs the XLA
one-walk custom-VJP (ops/pairwise.py::fused_pairwise_scores) — value
and gradient pins on the CPU interpreter, plus routing checks.

The on-chip A/B and exactness runs live in scripts/bench_pairwise.py
(f32 out bit-exact, grads at accumulation-order noise ~2e-6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctvae_tpu.ops.pairwise import fused_pairwise_scores, pairwise_mlp_scores
from ctvae_tpu.ops.pairwise_flash import flash_pairwise

NS = 0.01


def _mk(B=3, S=11, T=17, Hd=29, per_sample=False, dt=jnp.float32, seed=2):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    xl = jax.random.normal(ks[0], (B, S, Hd), dt)
    xr = jax.random.normal(ks[1], (B, T, Hd), dt)
    if per_sample:
        w2 = jax.random.normal(ks[2], (B, Hd), dt)
        b1 = jax.random.normal(ks[3], (B, Hd), dt)
        b2 = jax.random.normal(ks[4], (B,), dt)
    else:
        w2 = jax.random.normal(ks[2], (Hd,), dt)
        b1 = jax.random.normal(ks[3], (Hd,), dt)
        b2 = jnp.asarray(0.37, dt)
    return xl, xr, w2, b1, b2


@pytest.mark.parametrize("per_sample", [False, True])
def test_values_match_onewalk(per_sample):
    args = _mk(per_sample=per_sample)
    out_f = flash_pairwise(*args, NS, True)      # interpret on CPU
    out_x = fused_pairwise_scores(*args, NS)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("per_sample", [False, True])
def test_grads_match_onewalk(per_sample):
    args = _mk(per_sample=per_sample)
    S, T = args[0].shape[1], args[1].shape[1]
    cos = jnp.cos(jnp.arange(S * T, dtype=jnp.float32)).reshape(1, S, T)

    def loss(op):
        return lambda *a: jnp.sum(op(*a) * cos)

    g_f = jax.grad(loss(lambda *a: flash_pairwise(*a, NS, True)),
                   argnums=(0, 1, 2, 3, 4))(*args)
    g_x = jax.grad(loss(lambda *a: fused_pairwise_scores(*a, NS)),
                   argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g_f, g_x):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=5e-5)


def test_odd_shapes_pad_clean():
    # S/T far from the 8-multiples; padded rows must not leak
    args = _mk(B=2, S=5, T=9, Hd=13, seed=5)
    out_f = flash_pairwise(*args, NS, True)
    out_x = fused_pairwise_scores(*args, NS)
    assert out_f.shape == (2, 5, 9)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=0, atol=1e-6)


def test_router_respects_force_xla(monkeypatch):
    """CTVAE_FLASH_PAIRWISE=1 routes pairwise_mlp_scores through the
    kernel (interpret off-TPU); force_xla_scope pins it back off."""
    from ctvae_tpu.ops import pairwise as pw
    from ctvae_tpu.ops.gat import force_xla_scope

    monkeypatch.setenv("CTVAE_FLASH_PAIRWISE", "1")
    assert pw._use_flash_pairwise()
    with force_xla_scope():
        assert not pw._use_flash_pairwise()
    monkeypatch.setenv("CTVAE_FLASH_PAIRWISE", "0")
    assert not pw._use_flash_pairwise()


def test_mlp_scores_flash_path_matches(monkeypatch):
    """End-to-end through pairwise_mlp_scores with the flash route
    forced: same scores as the default XLA route."""
    monkeypatch.setenv("CTVAE_FLASH_PAIRWISE", "0")
    xl, xr, w2, b1, b2 = _mk(B=2, S=7, T=7, Hd=19, per_sample=True)
    ref = pairwise_mlp_scores(xl, xr, w2, b2, b1, NS)
    monkeypatch.setenv("CTVAE_FLASH_PAIRWISE", "1")
    out = pairwise_mlp_scores(xl, xr, w2, b2, b1, NS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)
