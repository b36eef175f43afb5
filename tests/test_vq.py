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


# ---------------------------------------------------------------------------
# EMA codebook learning + dead-code revival (opt-in, beyond the reference —
# its VQ trains the codebook by embedding loss only, vq_vae.py:46-52)
# ---------------------------------------------------------------------------

def _ema_apply(q, vs, lat, rng_seed=0):
    (_, loss), mut = q.apply(
        vs, lat, train=True, mutable=["vq_stats"],
        rngs={"noise": jax.random.PRNGKey(rng_seed)})
    return loss, {"vq_stats": mut["vq_stats"]}


def test_ema_codebook_tracks_batch_means():
    """EMA mode: the codebook lives in vq_stats (NOT params — it is not
    gradient-trained), the loss keeps only the commitment term, and
    repeated updates pull assigned codes onto the data cluster means."""
    q = VectorQuantizerMS(num_embeddings=4, embedding_dim=2,
                          ema=True, ema_decay=0.5)
    rng = np.random.default_rng(0)
    a = rng.normal(size=(64, 2)) * 0.05 + np.array([2.0, 2.0])
    b = rng.normal(size=(64, 2)) * 0.05 + np.array([-2.0, -2.0])
    lat = jnp.asarray(np.concatenate([a, b]).astype(np.float32)
                      .reshape(1, 16, 8, 2))
    vs = q.init(jax.random.PRNGKey(0), lat)
    assert "params" not in vs
    assert set(vs["vq_stats"]) == {"embedding", "cluster_size", "embed_avg"}
    for _ in range(30):
        loss, vs = _ema_apply(q, vs, lat)
        assert np.isfinite(float(loss))
    emb = np.asarray(vs["vq_stats"]["embedding"])
    assert np.abs(emb - np.array([2.0, 2.0])).sum(1).min() < 0.2
    assert np.abs(emb + np.array([2.0, 2.0])).sum(1).min() < 0.2
    # eval applies are immutable — an EMA-mode forward must not write
    q.apply(vs, lat, train=False)


def test_ema_dead_code_revival():
    """revive_threshold: codes whose EMA count decays below the threshold
    are re-seeded from random batch latents, so no code strands at the
    (near-zero) init far from the data cloud."""
    q = VectorQuantizerMS(num_embeddings=8, embedding_dim=2, ema=True,
                          ema_decay=0.5, revive_threshold=0.1)
    rng = np.random.default_rng(1)
    data = (rng.normal(size=(128, 2)) * 0.1 + np.array([5.0, 5.0]))
    lat = jnp.asarray(data.astype(np.float32).reshape(1, 16, 8, 2))
    vs = q.init(jax.random.PRNGKey(0), lat)
    for i in range(5):
        _, vs = _ema_apply(q, vs, lat, rng_seed=i)
    emb = np.asarray(vs["vq_stats"]["embedding"])
    # every row (not just the winner) now sits on the data cloud
    assert np.all(np.linalg.norm(emb - np.array([5.0, 5.0]), axis=1) < 1.0)

    # without revival, the never-assigned codes stay near the origin
    q0 = VectorQuantizerMS(num_embeddings=8, embedding_dim=2, ema=True,
                           ema_decay=0.5)
    vs0 = q0.init(jax.random.PRNGKey(0), lat)
    for i in range(5):
        _, vs0 = _ema_apply(q0, vs0, lat, rng_seed=i)
    emb0 = np.asarray(vs0["vq_stats"]["embedding"])
    assert np.any(np.linalg.norm(emb0 - np.array([5.0, 5.0]), axis=1) > 4.0)


def test_ema_update_is_global_over_sharded_batch():
    """The EMA fold-in reduces over the GLOBAL batch under SPMD: with the
    batch sharded over the 8-device data axis, the updated stats are
    identical to the single-device update (XLA inserts the cross-chip
    reduction from the sharding annotations)."""
    import chex
    from ctvae_tpu.parallel import make_mesh, replicated
    from jax.sharding import NamedSharding, PartitionSpec as P

    q = MultipleCodebookVectorQuantizer(num_embeddings=6, embedding_dim=4,
                                        codebooks=2, ema=True,
                                        ema_decay=0.9)
    lat = jnp.asarray(np.random.default_rng(2).normal(
        size=(16, 4, 4, 4)).astype(np.float32))
    vs = q.init(jax.random.PRNGKey(0), lat)

    def step(vs_, lat_):
        _, mut = q.apply(vs_, lat_, train=True, mutable=["vq_stats"])
        return mut["vq_stats"]

    ref = jax.device_get(jax.jit(step)(vs, lat))
    mesh = make_mesh()
    lat_sh = jax.device_put(lat, NamedSharding(mesh, P("data")))
    vs_rep = jax.device_put(vs, replicated(mesh))
    got = jax.device_get(jax.jit(step)(vs_rep, lat_sh))
    chex.assert_trees_all_close(ref, got, rtol=2e-6, atol=2e-6)


def test_ema_models_train_and_mutate_vq_stats():
    """Model-level integration: VQVAE/MCQVAE/CTMCQVAE with ema=True run
    the jitted train step, the vq_stats collection moves, params carry no
    codebook leaf, and eval steps leave the stats untouched."""
    from ctvae_tpu.training import make_eval_step

    rng = np.random.default_rng(3)
    cases = [
        ("VQVAE", dict(embedding_dim=8, num_embeddings=16,
                       hidden_dims=(16, 32), img_size=16), {}),
        ("MCQVAE", dict(embedding_dim=8, num_embeddings=16,
                        hidden_dims=(16, 32), img_size=16, codebooks=2),
         {}),
        ("CTMCQVAE", dict(embedding_dim=8, num_embeddings=8, action_dim=4,
                          hidden_dims=(8, 16), img_size=16, codebooks=2,
                          causal_hidden_dims=(16, 8)),
         {"action": jnp.asarray(np.eye(4, dtype=np.float32)[
             rng.integers(0, 4, size=4)]),
          "input_y": jnp.asarray(rng.uniform(
              size=(4, 16, 16, 3)).astype(np.float32))}),
    ]
    for name, kwargs, extra in cases:
        model = vae_models[name](in_channels=3, ema=True,
                                 revive_threshold=0.01, **kwargs)
        batch = {"image": jnp.asarray(rng.uniform(
            size=(4, 16, 16, 3)).astype(np.float32)), **extra}
        txs = [optax.adam(1e-3)]
        state = create_train_state(model, jax.random.PRNGKey(0), batch,
                                   txs, fwd_kwargs_keys=("action",
                                                         "input_y"))
        flat = jax.tree_util.tree_leaves_with_path(state.params)
        assert not any("embedding" in str(p) for p, _ in flat), name
        assert "vq_stats" in state.model_state, name
        static = ({"mode": "action"} if name == "CTMCQVAE" else None)
        step = jax.jit(make_train_step(
            model, txs, M_N=0.005, fwd_kwargs_keys=("action", "input_y"),
            static_fwd_kwargs=static))
        before = jax.device_get(state.model_state["vq_stats"])
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"])), name
        after = jax.device_get(state2.model_state["vq_stats"])
        changed = any(
            not np.allclose(b, a) for b, a in zip(
                jax.tree_util.tree_leaves(before),
                jax.tree_util.tree_leaves(after)))
        assert changed, f"{name}: vq_stats did not move on a train step"
        ev = jax.jit(make_eval_step(
            model, fwd_kwargs_keys=("action", "input_y"),
            static_fwd_kwargs=static))
        ev(state2, batch)  # immutable apply: must not raise


def test_codebook_perplexity_bounds_and_values():
    """exp-entropy of assignment counts: uniform usage -> K, collapse ->
    1; forward passes surface it as Codebook_Perplexity."""
    from ctvae_tpu.models.quantizers import codebook_perplexity

    uniform = jnp.tile(jnp.arange(8, dtype=jnp.int32), 4)
    np.testing.assert_allclose(
        float(codebook_perplexity(uniform, 8)), 8.0, rtol=1e-6)
    collapsed = jnp.zeros((32,), jnp.int32)
    np.testing.assert_allclose(
        float(codebook_perplexity(collapsed, 8)), 1.0, rtol=1e-6)

    model = vae_models["VQVAE"](in_channels=3, embedding_dim=8,
                                num_embeddings=16, hidden_dims=(16, 32),
                                img_size=16)
    batch = {"image": jnp.asarray(np.random.default_rng(7).uniform(
        size=(4, 16, 16, 3)).astype(np.float32))}
    txs = [optax.adam(1e-3)]
    state = create_train_state(model, jax.random.PRNGKey(0), batch, txs)
    step = jax.jit(make_train_step(model, txs, M_N=0.005))
    _, metrics = step(state, batch)
    p = float(metrics["Codebook_Perplexity"])
    assert 1.0 <= p <= 16.0, p
