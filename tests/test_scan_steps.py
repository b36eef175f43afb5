"""make_multi_train_step (lax.scan over K train steps) must be
SEMANTICALLY IDENTICAL to K sequential make_train_step calls — same
params, same optimizer state, same per-step PRNG folds — because the
experiment layer swaps freely between the two (exp_params.scan_steps).
Also drives the VAEXperiment integration: scanned epochs produce the
same final state as per-step epochs on the same stream."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ctvae_tpu.models import vae_models
from ctvae_tpu.training import (VAEXperiment, create_train_state,
                                make_multi_train_step, make_train_step)

K = 3


def _batches(b=4, img=16, n=K, channels=3, seed=0):
    rng = np.random.default_rng(seed)
    return [{"image": jnp.asarray(rng.uniform(size=(b, img, img, channels))
                                  .astype(np.float32))}
            for _ in range(n)]


@pytest.mark.quick
def test_scan_matches_sequential_steps():
    """SGD keeps the comparison well-conditioned: under Adam, conv
    biases that feed straight into BatchNorm have exactly-zero true
    gradients (BN subtracts the mean), so m/(sqrt(v)+eps) amplifies
    per-executable rounding noise into O(lr) jumps along
    loss-IRRELEVANT null directions — strict param equality there
    tests compiler fusion choices, not scan semantics. Functional
    (loss) equality under Adam is asserted separately below."""
    model = vae_models["VanillaVAE"](in_channels=3, latent_dim=8,
                                     img_size=16, hidden_dims=(16, 32))
    batches = _batches()
    txs = [optax.sgd(1e-2)]
    state0 = create_train_state(model, jax.random.PRNGKey(0), batches[0],
                                txs)

    step = jax.jit(make_train_step(model, txs, M_N=0.005))
    s_seq = state0
    for b in batches:
        s_seq, m_seq = step(s_seq, b)

    multi = jax.jit(make_multi_train_step(model, txs, n_steps=K,
                                          M_N=0.005))
    stacked = {k: jnp.stack([b[k] for b in batches])
               for k in batches[0]}
    s_scan, m_scan = multi(state0, stacked)

    assert int(s_scan.step) == int(s_seq.step) == K
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=2e-6, atol=2e-7),
        s_seq.params, s_scan.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=2e-6, atol=2e-7),
        s_seq.opt_states, s_scan.opt_states)
    # returned metrics are the LAST step's
    np.testing.assert_allclose(float(m_scan["loss"]), float(m_seq["loss"]),
                               rtol=2e-6)


def test_scan_matches_sequential_adam_loss():
    """Adam variant: trajectories may drift along BN-null directions
    (see above), but the OBSERVABLE training signal — the per-step loss
    and the final batch-stats — must match tightly."""
    model = vae_models["VanillaVAE"](in_channels=3, latent_dim=8,
                                     img_size=16, hidden_dims=(16, 32))
    batches = _batches(seed=1)
    txs = [optax.adam(1e-3)]
    state0 = create_train_state(model, jax.random.PRNGKey(0), batches[0],
                                txs)
    step = jax.jit(make_train_step(model, txs, M_N=0.005))
    s_seq = state0
    for b in batches:
        s_seq, m_seq = step(s_seq, b)
    multi = jax.jit(make_multi_train_step(model, txs, n_steps=K,
                                          M_N=0.005))
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    s_scan, m_scan = multi(state0, stacked)
    np.testing.assert_allclose(float(m_scan["loss"]), float(m_seq["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        float(m_scan["Reconstruction_Loss"]),
        float(m_seq["Reconstruction_Loss"]), rtol=1e-5)


def test_experiment_scan_steps_integration():
    """VAEXperiment with exp_params.scan_steps trains CTMCQVAE (the
    mode-switching flagship) through scanned blocks: mode switches and
    epoch-tail batch sizes flush correctly, and the step counter equals
    the number of real batches."""
    from ctvae_tpu.data import VAEDataset

    mp = dict(in_channels=3, embedding_dim=8, action_dim=8,
              hidden_dims=[8, 16], num_embeddings=8, img_size=16,
              codebooks=2, causal_hidden_dims=[16, 8], gamma=1.5)
    model = vae_models["CTMCQVAE"](**mp)
    data = VAEDataset("", dataset_name="TSynthetic", train_batch_size=8,
                      val_batch_size=8, patch_size=16, distributed=False,
                      limit=40, val_limit=8)
    data.setup()
    # hang_watchdog routes the metric fetches through watchdog_call —
    # this also asserts no false positives on a healthy backend
    exp = VAEXperiment(model, {"LR": 1e-3, "kld_weight": 0.00025,
                               "manual_seed": 0, "scan_steps": 2,
                               "hang_watchdog": 120.0}, data)
    first = next(iter(data.train_dataloader(0)))
    exp.setup(first, seed=0)
    n_batches = sum(1 for _ in data.train_dataloader(0))
    host = exp.train_epoch(0)
    assert exp.global_step == n_batches
    assert int(exp.state.step) == n_batches
    assert np.isfinite(host["loss"])
