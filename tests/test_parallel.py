"""Mesh/sharding tests: pure-DP and DP x TP training steps on the
8-device virtual mesh, and the param-sharding rule engine."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ctvae_tpu.models import vae_models
from ctvae_tpu.parallel import (MODEL_AXIS, make_mesh, param_shardings,
                                replicated, shard_batch, shard_params)
from ctvae_tpu.training import create_train_state, make_train_step

FWD_KEYS = ("action", "input_y")


def _ct_model():
    return vae_models["CTMCQVAE"](
        in_channels=3, embedding_dim=8, action_dim=4, num_embeddings=8,
        hidden_dims=(8, 16), img_size=16, codebooks=2,
        causal_hidden_dims=(16, 8))


def _batch(model, b, img=16):
    rng = jax.random.PRNGKey(0)
    return {
        "image": jax.random.uniform(rng, (b, img, img, 3)),
        "input_y": jax.random.uniform(rng, (b, img, img, 3)),
        "action": jax.nn.one_hot(
            jax.random.randint(rng, (b,), 0, model.action_dim),
            model.action_dim),
    }


def test_param_shardings_rules(devices):
    mesh = make_mesh(devices, model_axis=2)
    model = _ct_model()
    batch = _batch(model, 8)
    state = create_train_state(model, jax.random.PRNGKey(0), batch,
                               [optax.adam(1e-3)], fwd_kwargs_keys=FWD_KEYS)
    shardings = param_shardings(jax.device_get(state.params), mesh)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded, total = 0, 0
    for path, sh in flat:
        total += 1
        name = str(path[-1].key)
        spec = sh.spec
        if name in ("disc_w1l", "disc_w1r", "disc_b1", "embedding"):
            assert MODEL_AXIS in tuple(spec), (name, spec)
            sharded += 1
        else:
            assert all(s is None for s in tuple(spec)), (name, spec)
    assert sharded >= 5  # 3 discoverer leaves + 2 codebooks


def test_tp_step_matches_dp_step(devices):
    """One action-mode step on a (4,2) DP x TP mesh must produce the same
    loss as on the (8,1) pure-DP mesh — sharding is a layout, not math."""
    model = _ct_model()
    batch = _batch(model, 8)
    txs = [optax.adam(1e-3)]

    losses = {}
    for model_axis in (1, 2):
        mesh = make_mesh(devices, model_axis=model_axis)
        state = create_train_state(model, jax.random.PRNGKey(0), batch, txs,
                                   fwd_kwargs_keys=FWD_KEYS)
        with mesh:
            params = (shard_params(jax.device_get(state.params), mesh)
                      if model_axis > 1 else
                      jax.device_put(state.params, replicated(mesh)))
            opt_states = tuple(tx.init(params) for tx in txs)
            state = state.replace(
                params=params, opt_states=opt_states,
                step=jax.device_put(state.step, replicated(mesh)),
                rng=jax.device_put(state.rng, replicated(mesh)),
                model_state=jax.device_put(
                    jax.device_get(state.model_state), replicated(mesh)))
            sbatch = shard_batch(batch, mesh)
            step = jax.jit(make_train_step(
                model, txs, M_N=0.005, fwd_kwargs_keys=FWD_KEYS,
                static_fwd_kwargs={"mode": "action"}))
            state, metrics = step(state, sbatch)
            losses[model_axis] = float(metrics["loss"])
    np.testing.assert_allclose(losses[1], losses[2], rtol=1e-4)
