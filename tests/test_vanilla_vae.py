"""Smoke + training tests for VanillaVAE — the reference's per-model test
pattern (construct -> forward shape -> loss finite, cf.
/root/reference/tests/test_vae.py) but with real assertions, plus a
jit+mesh training test the reference never had."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ctvae_tpu.models import build_model, vae_models
from ctvae_tpu.models.base import RNG_STREAMS
from ctvae_tpu.parallel import batch_sharding, make_mesh, replicated, shard_batch
from ctvae_tpu.training import (build_optimizers, create_train_state,
                                make_eval_step, make_train_step)


def _init(model, batch, seed=0):
    rng = jax.random.PRNGKey(seed)
    rngs = {"params": rng, **{s: jax.random.fold_in(rng, i + 1)
                              for i, s in enumerate(RNG_STREAMS)}}
    return model.init(rngs, batch, train=True)


def test_forward_shapes():
    model = vae_models["VanillaVAE"](in_channels=3, latent_dim=10)
    x = jnp.zeros((4, 64, 64, 3))
    variables = _init(model, x)
    rngs = {s: jax.random.PRNGKey(i) for i, s in enumerate(RNG_STREAMS)}
    out, _ = model.apply(variables, x, train=True, rngs=rngs,
                         mutable=["batch_stats"])
    assert out["recons"].shape == (4, 64, 64, 3)
    assert out["mu"].shape == (4, 10)
    assert out["log_var"].shape == (4, 10)


def test_loss_finite_and_components():
    model = vae_models["VanillaVAE"](in_channels=3, latent_dim=10)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 64, 64, 3))
    variables = _init(model, x)
    rngs = {s: jax.random.PRNGKey(i) for i, s in enumerate(RNG_STREAMS)}
    out, _ = model.apply(variables, x, train=True, rngs=rngs,
                         mutable=["batch_stats"])
    losses = model.loss_function(out, M_N=0.005)
    assert np.isfinite(float(losses["loss"]))
    # loss = recon + M_N * KL and KLD is logged negated (reference
    # vanilla_vae.py:143-146)
    np.testing.assert_allclose(
        float(losses["loss"]),
        float(losses["Reconstruction_Loss"]) + 0.005 * (-float(losses["KLD"])),
        rtol=1e-5)


def test_registry_aliases():
    assert vae_models["VAE"] is vae_models["VanillaVAE"]
    assert vae_models["GaussianVAE"] is vae_models["VanillaVAE"]
    m = build_model({"name": "VanillaVAE", "in_channels": 3,
                     "latent_dim": 16, "unused_yaml_key": 1})
    assert m.latent_dim == 16


def test_train_step_reduces_loss_on_mesh(devices):
    assert len(devices) == 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(devices)
    model = vae_models["VanillaVAE"](in_channels=3, latent_dim=8,
                                     hidden_dims=(16, 32), img_size=16)
    x = jax.random.uniform(jax.random.PRNGKey(0), (16, 16, 16, 3))
    batch = {"image": x}
    txs = [optax.adam(1e-3)]
    state = create_train_state(model, jax.random.PRNGKey(0), batch, txs)
    step = jax.jit(make_train_step(model, txs, M_N=0.005))

    with mesh:
        sbatch = shard_batch(batch, mesh)
        state = jax.device_put(state, replicated(mesh))
        first = None
        for _ in range(30):
            state, metrics = step(state, sbatch)
            if first is None:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
    assert last < first, (first, last)
    assert int(state.step) == 30


def test_eval_step_deterministic():
    model = vae_models["VanillaVAE"](in_channels=3, latent_dim=8,
                                     hidden_dims=(16, 32), img_size=16)
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 3))
    batch = {"image": x}
    txs = [optax.adam(1e-3)]
    state = create_train_state(model, jax.random.PRNGKey(0), batch, txs)
    ev = jax.jit(make_eval_step(model, M_N=1.0))
    m1 = ev(state, batch)
    m2 = ev(state, batch)
    assert float(m1["loss"]) == float(m2["loss"])


def test_sample_and_generate():
    model = vae_models["VanillaVAE"](in_channels=3, latent_dim=8,
                                     hidden_dims=(16, 32), img_size=16)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
    variables = _init(model, x)
    rngs = {s: jax.random.PRNGKey(i) for i, s in enumerate(RNG_STREAMS)}
    samples = model.apply(variables, 5, train=False, rngs=rngs,
                          method=model.sample)
    assert samples.shape == (5, 16, 16, 3)
    recons = model.apply(variables, x, train=False, rngs=rngs,
                         method=model.generate)
    assert recons.shape == x.shape
