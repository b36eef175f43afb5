"""VQ / MCQ quantizer tests — coverage the reference never had
(SURVEY.md §4: no MCQVAE/CTMCQVAE tests upstream)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ctvae_tpu.models import vae_models
from ctvae_tpu.models.quantizers import (MultipleCodebookVectorQuantizer,
                                         VectorQuantizerMS)
from ctvae_tpu.ops.vq import l2_argmin_xla
from ctvae_tpu.training import create_train_state, make_train_step


def test_l2_argmin_matches_bruteforce():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(257, 16)).astype(np.float32)
    cb = rng.normal(size=(33, 16)).astype(np.float32)
    dist = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
    expected = dist.argmin(1)
    got = np.asarray(l2_argmin_xla(jnp.asarray(x), jnp.asarray(cb)))
    np.testing.assert_array_equal(got, expected)


def test_quantizer_inds_and_straight_through():
    q = VectorQuantizerMS(num_embeddings=11, embedding_dim=8)
    lat = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, 4, 4, 8)).astype(np.float32))
    variables = q.init(jax.random.PRNGKey(0), lat)
    inds = q.apply(variables, lat, method=q.compute_inds)
    assert inds.shape == (2, 4, 4)
    quantized, vq_loss = q.apply(variables, lat, inds,
                                 method=q.compute_latents)
    assert quantized.shape == lat.shape
    emb = variables["params"]["embedding"]
    np.testing.assert_allclose(
        np.asarray(quantized), np.asarray(emb)[np.asarray(inds)], atol=1e-5)

    # straight-through: d quantized / d latents == identity
    def f(latents):
        out, _ = q.apply(variables, latents, inds, method=q.compute_latents)
        return jnp.sum(out)

    g = jax.grad(f)(lat)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(g), rtol=1e-6)


def test_multi_codebook_chunking():
    q = MultipleCodebookVectorQuantizer(num_embeddings=7, embedding_dim=12,
                                        codebooks=3)
    lat = jnp.asarray(np.random.default_rng(2).normal(
        size=(2, 2, 2, 12)).astype(np.float32))
    variables = q.init(jax.random.PRNGKey(0), lat)
    inds = q.apply(variables, lat, method=q.compute_inds)
    assert inds.shape == (2, 3, 2, 2)          # [B, C, H, W]
    quantized, vq_loss, inds2 = q.apply(variables, lat, inds=True)
    assert quantized.shape == lat.shape
    np.testing.assert_array_equal(np.asarray(inds), np.asarray(inds2))
    # each chunk quantized against its own codebook
    for i in range(3):
        emb = variables["params"][f"quantizers_{i}"]["embedding"]
        chunk = np.asarray(lat[..., i * 4:(i + 1) * 4]).reshape(-1, 4)
        expected = np.asarray(l2_argmin_xla(jnp.asarray(chunk),
                                            jnp.asarray(emb)))
        np.testing.assert_array_equal(
            np.asarray(inds[:, i]).reshape(-1), expected)


@pytest.mark.parametrize("name,kwargs", [
    ("VQVAE", dict(embedding_dim=8, num_embeddings=16, hidden_dims=(16, 32),
                   img_size=16)),
    ("MCQVAE", dict(embedding_dim=8, num_embeddings=16, hidden_dims=(16, 32),
                    img_size=16, codebooks=2)),
])
def test_vq_models_train(name, kwargs):
    model = vae_models[name](in_channels=3, **kwargs)
    batch = {"image": jnp.asarray(np.random.default_rng(0).uniform(
        size=(4, 16, 16, 3)).astype(np.float32))}
    txs = [optax.adam(1e-3)]
    state = create_train_state(model, jax.random.PRNGKey(0), batch, txs)
    step = jax.jit(make_train_step(model, txs, M_N=0.005))
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert "VQ_Loss" in metrics
    # codebooks receive gradient (embedding loss term)
    if name == "VQVAE":
        e1 = state.params["vq_layer"]["embedding"]
        e2 = state2.params["vq_layer"]["embedding"]
    else:
        e1 = state.params["vq_layer"]["quantizers_0"]["embedding"]
        e2 = state2.params["vq_layer"]["quantizers_0"]["embedding"]
    assert float(jnp.sum(jnp.abs(e1 - e2))) > 0


def test_rotation_trick_value_and_gradient():
    """grad_estimator="rotation" (arXiv:2410.06424, PAPERS.md): the
    quantized VALUE is identical to the straight-through estimator's
    (both return the codebook vector), but d out/d latents is the
    rotation-and-rescale lambda * R^T carrying e onto q — checked
    against an explicitly materialized R — and the codebook still
    receives gradient only through the embedding loss."""
    from ctvae_tpu.models.quantizers import rotate_to

    rng = np.random.default_rng(5)
    lat = jnp.asarray(rng.normal(size=(2, 3, 3, 6)).astype(np.float32))
    outs = {}
    for est in ("ste", "rotation"):
        q = VectorQuantizerMS(num_embeddings=9, embedding_dim=6,
                              grad_estimator=est)
        variables = q.init(jax.random.PRNGKey(0), lat)
        outs[est] = q.apply(variables, lat)
    np.testing.assert_allclose(np.asarray(outs["ste"][0]),
                               np.asarray(outs["rotation"][0]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(outs["ste"][1]),
                               float(outs["rotation"][1]), rtol=1e-6)

    # gradient: build R = I - 2 r r^T + 2 qhat ehat^T explicitly
    e = jnp.asarray(rng.normal(size=(1, 6)).astype(np.float32))
    qv = jnp.asarray(rng.normal(size=(1, 6)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 6)).astype(np.float32))
    out_val = rotate_to(e, qv)
    np.testing.assert_allclose(np.asarray(out_val), np.asarray(qv),
                               rtol=1e-5, atol=1e-6)
    g = jax.grad(lambda e_: jnp.sum(rotate_to(e_, qv) * v))(e)
    ehat = np.asarray(e[0]) / np.linalg.norm(e[0])
    qhat = np.asarray(qv[0]) / np.linalg.norm(qv[0])
    r = ehat + qhat
    r = r / np.linalg.norm(r)
    R = np.eye(6) - 2 * np.outer(r, r) + 2 * np.outer(qhat, ehat)
    lam = np.linalg.norm(qv[0]) / np.linalg.norm(e[0])
    np.testing.assert_allclose(np.asarray(g[0]), lam * (R.T @ np.asarray(v[0])),
                               rtol=1e-4, atol=1e-5)
    # R actually carries e onto q (sanity of the construction itself)
    np.testing.assert_allclose(lam * (R @ np.asarray(e[0])),
                               np.asarray(qv[0]), rtol=1e-4, atol=1e-5)


def test_vq_models_train_rotation():
    """The full VQ model family trains with grad_estimator="rotation"
    (finite loss, codebook moving) — the opt-in beyond-reference knob."""
    for name, kwargs in (
            ("VQVAE", dict(embedding_dim=8, num_embeddings=16,
                           hidden_dims=(16, 32), img_size=16)),
            ("MCQVAE", dict(embedding_dim=8, num_embeddings=16,
                            hidden_dims=(16, 32), img_size=16,
                            codebooks=2))):
        model = vae_models[name](in_channels=3, grad_estimator="rotation",
                                 **kwargs)
        batch = {"image": jnp.asarray(np.random.default_rng(0).uniform(
            size=(4, 16, 16, 3)).astype(np.float32))}
        txs = [optax.adam(1e-3)]
        state = create_train_state(model, jax.random.PRNGKey(0), batch, txs)
        step = jax.jit(make_train_step(model, txs, M_N=0.005))
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"])), name
