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
