"""CT-VAE tests — dense GATv2 semantics, CausalTransition modes, CTMCQVAE
training in all three batch modes, and the two-stage freezing recipe.
The reference ships NO tests for any of this (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ctvae_tpu.models import vae_models
from ctvae_tpu.models.base import RNG_STREAMS
from ctvae_tpu.models.ct_vae import CausalTransition, CTMCQVAE
from ctvae_tpu.ops.gat import DenseGATv2Layer
from ctvae_tpu.training import (build_optimizers, create_train_state,
                                make_train_step)

RNGS = {s: jax.random.PRNGKey(i + 7) for i, s in enumerate(RNG_STREAMS)}


def _tree_diff(t1, t2) -> float:
    diffs = jax.tree_util.tree_map(
        lambda a, b: jnp.sum(jnp.abs(a - b)), t1, t2)
    return float(jax.tree_util.tree_reduce(lambda acc, x: acc + x, diffs, 0.0))


def _gatv2_numpy(params, x, adj, heads, out_f, slope=0.2):
    """Edge-list evaluation of GATv2 with the PyG-default self-loop
    replacement (remove diagonal edges, add one self-loop per node whose
    edge attr is the mean of its remaining incoming weights) — the
    sparse semantics the dense layer must reproduce. Independently
    cross-checked against the torch fixture in test_gat_vs_pyg.py."""
    adj = adj.copy()
    B, T, _ = x.shape
    for b in range(B):
        np.fill_diagonal(adj[b], 0.0)
        for t in range(T):
            incoming = adj[b, :, t][adj[b, :, t] != 0]
            adj[b, t, t] = incoming.mean() if len(incoming) else 0.0
    self_loop = np.eye(T, dtype=bool)
    Wl, bl = params["lin_l"]["kernel"], params["lin_l"]["bias"]
    Wr, br = params["lin_r"]["kernel"], params["lin_r"]["bias"]
    We = params["lin_edge"].reshape(heads, out_f)
    att = params["att"]
    bias = params["bias"]
    out = np.zeros((B, T, heads * out_f), np.float32)
    xl = (x @ Wl + bl).reshape(B, T, heads, out_f)
    xr = (x @ Wr + br).reshape(B, T, heads, out_f)
    for b in range(B):
        for t in range(T):
            # edge exists where off-diagonal weight != 0, plus the
            # always-present self-loop (possibly with attr 0)
            srcs = [s for s in range(T)
                    if adj[b, s, t] != 0 or self_loop[s, t]]
            for h in range(heads):
                logits = []
                for s in srcs:
                    pre = xl[b, s, h] + xr[b, t, h] + adj[b, s, t] * We[h]
                    pre = np.where(pre > 0, pre, slope * pre)
                    logits.append(att[h] @ pre)
                logits = np.array(logits)
                alpha = np.exp(logits - logits.max())
                alpha /= alpha.sum()
                msg = sum(a * xl[b, s, h] for a, s in zip(alpha, srcs))
                out[b, t, h * out_f:(h + 1) * out_f] = msg
    return out + bias


def test_dense_gatv2_matches_sparse_semantics():
    B, T, Fin, H, Fout = 2, 5, 6, 3, 4
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, Fin)).astype(np.float32)
    adj = (rng.uniform(size=(B, T, T)) > 0.5).astype(np.float32) * \
        rng.uniform(0.2, 1.0, size=(B, T, T)).astype(np.float32)
    adj[0, :, 3] = 0.0  # a node with no incoming edges
    layer = DenseGATv2Layer(out_features=Fout, heads=H)
    variables = layer.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(adj))
    got = np.asarray(layer.apply(variables, jnp.asarray(x), jnp.asarray(adj)))
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    expected = _gatv2_numpy(p, x, adj, H, Fout)
    np.testing.assert_allclose(got, expected, atol=2e-5)


def _ct_module():
    return CausalTransition(input_dim=8, action_dim=4, latent_dims=(16, 8))


def test_pairwise_onewalk_matches_checkpoint(monkeypatch):
    """CTVAE_PAIRWISE_ONEWALK (one-walk custom-VJP backward for the
    fused pairwise scorer) is value- and gradient-identical to the
    checkpointed recompute form, for both the shared ([H] w2, scalar b2)
    and per-sample ([B,H] w2, [B] b2) parameter shapes."""
    from ctvae_tpu.ops.pairwise import pairwise_mlp_scores

    rng = np.random.RandomState(11)
    B, S, H = 3, 6, 5
    xl = jnp.asarray(rng.randn(B, S, H), jnp.float32)
    xr = jnp.asarray(rng.randn(B, S, H), jnp.float32)
    cases = {
        "shared": (jnp.asarray(rng.randn(H), jnp.float32),
                   jnp.float32(0.3),
                   jnp.asarray(rng.randn(H), jnp.float32)),
        "per_sample": (jnp.asarray(rng.randn(B, H), jnp.float32),
                       jnp.asarray(rng.randn(B), jnp.float32),
                       jnp.asarray(rng.randn(B, H), jnp.float32)),
    }
    for name, (w2, b2, b1) in cases.items():
        def loss(xl_, xr_, w2_, b2_, b1_):
            out = pairwise_mlp_scores(xl_, xr_, w2_, b2_, b1_, fused=True)
            return jnp.sum(jnp.sin(3.0 * out))

        got = {}
        for env in ("0", "1"):
            monkeypatch.setenv("CTVAE_PAIRWISE_ONEWALK", env)
            got[env] = (
                pairwise_mlp_scores(xl, xr, w2, b2, b1, fused=True),
                jax.grad(loss, argnums=(0, 1, 2, 3, 4))(xl, xr, w2, b2, b1),
            )
        for a, b in zip(jax.tree_util.tree_leaves(got["0"]),
                        jax.tree_util.tree_leaves(got["1"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6, err_msg=name)
        # and both match the plain einsum (non-fused) form
        monkeypatch.setenv("CTVAE_PAIRWISE_ONEWALK", "1")
        plain = pairwise_mlp_scores(xl, xr, w2, b2, b1, fused=False)
        np.testing.assert_allclose(np.asarray(got["1"][0]),
                                   np.asarray(plain), rtol=1e-5, atol=1e-6)


def test_causal_transition_modes():
    ct = _ct_module()
    B, S, N = 2, 6, 8
    one_hot = jax.nn.one_hot(
        jnp.asarray(np.random.default_rng(0).integers(0, N, (B, S))), N)
    variables = ct.init({"params": jax.random.PRNGKey(0), **RNGS}, one_hot)

    y, reg, metrics = ct.apply(variables, one_hot, rngs=RNGS)
    assert y.shape == (B, S, N)
    np.testing.assert_allclose(np.asarray(jnp.sum(y, -1)), 1.0, atol=1e-5)
    assert np.isfinite(float(reg))
    assert metrics["ct_adjacency"].shape == (S, S)

    action = jax.nn.one_hot(jnp.asarray([1, 3]), 4)
    y2, reg2, m2 = ct.apply(variables, one_hot, action, rngs=RNGS,
                            method=ct.forward_action)
    assert y2.shape == (B, S, N)
    assert np.isfinite(float(reg2))
    assert m2["ct_mask"].shape == (S,)

    probas, zero, _ = ct.apply(variables, one_hot, y2, rngs=RNGS,
                               method=ct.forward_transition)
    assert probas.shape == (B, 4)
    np.testing.assert_allclose(np.asarray(jnp.sum(probas, -1)), 1.0,
                               atol=1e-5)


def _ct_model(**over):
    kw = dict(in_channels=3, embedding_dim=8, action_dim=4,
              num_embeddings=8, hidden_dims=(16, 32), img_size=16,
              codebooks=2, causal_hidden_dims=(16, 8), gamma=1.5)
    kw.update(over)
    return CTMCQVAE(**kw)


def _batch(mode, b=2, img=16):
    rng = np.random.default_rng(0)
    batch = {"image": jnp.asarray(rng.uniform(size=(b, img, img, 3))
                                  .astype(np.float32))}
    if mode != "base":
        batch["input_y"] = jnp.asarray(rng.uniform(size=(b, img, img, 3))
                                       .astype(np.float32))
        onehot = np.zeros((b, 4), np.float32)
        onehot[np.arange(b), rng.integers(0, 4, b)] = 1.0
        batch["action"] = jnp.asarray(onehot)
    return batch


@pytest.mark.parametrize("mode", ["base", "action", "causal"])
def test_ctmcqvae_modes_train(mode):
    model = _ct_model()
    batch = _batch(mode)
    keys = ["action", "input_y"]
    txs = [optax.adam(1e-3)]
    state = create_train_state(model, jax.random.PRNGKey(0), batch, txs,
                               fwd_kwargs_keys=keys)
    step = jax.jit(make_train_step(model, txs, M_N=0.00025,
                                   fwd_kwargs_keys=keys,
                                   static_fwd_kwargs={"mode": mode}))
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"])), (mode, metrics)
    assert float(metrics["mode_id"]) == {"base": 0.0, "action": 1.0,
                                         "causal": 2.0}[mode]
    if mode == "causal":
        assert 0.0 <= float(metrics["causal_acc"]) <= 1.0
    else:
        assert metrics["ct_adjacency"].ndim == 2


def test_two_stage_freezing():
    """The reference two-stage recipe: pretrain MCQ backbone, then train
    only ``ct_layer`` via ``update_parameters``
    (/root/reference/configs/ct_mcq_vae.yaml:38, experiment.py:157)."""
    model = _ct_model()
    batch = _batch("action")
    keys = ["action", "input_y"]
    dummy = [optax.adam(1e-3)]
    state = create_train_state(model, jax.random.PRNGKey(0), batch, dummy,
                               fwd_kwargs_keys=keys)
    txs = build_optimizers({"LR": 1e-3, "update_parameters": "ct_layer"},
                           state.params)
    state = state.replace(opt_states=tuple(tx.init(state.params)
                                           for tx in txs))
    step = jax.jit(make_train_step(model, txs, M_N=0.00025,
                                   fwd_kwargs_keys=keys,
                                   static_fwd_kwargs={"mode": "action"}))
    state2, _ = step(state, batch)
    # encoder/decoder/vq frozen, ct_layer moved
    for key in ["encoder", "decoder", "vq_layer"]:
        assert _tree_diff(state.params[key], state2.params[key]) == 0.0, \
            f"{key} should be frozen"
    assert _tree_diff(state.params["ct_layer"],
                      state2.params["ct_layer"]) > 0.0, "ct_layer should train"


def test_latent_walk():
    """walk(): shape, per-walk channel consistency (the base latent is
    shared inside a walk; only the chosen channels vary across steps)."""
    import jax
    import jax.numpy as jnp
    from ctvae_tpu.models import vae_models
    from ctvae_tpu.models.base import RNG_STREAMS

    model = vae_models["CTMCQVAE"](
        in_channels=3, embedding_dim=8, action_dim=4, num_embeddings=8,
        hidden_dims=(8, 16), img_size=16, codebooks=2,
        causal_hidden_dims=(16, 8))
    x = jnp.zeros((2, 16, 16, 3))
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, **{s: jax.random.fold_in(rng, i + 1)
                              for i, s in enumerate(RNG_STREAMS)}}
    variables = model.init(rngs, x, train=False)
    apply_rngs = {s: jax.random.PRNGKey(3 + i)
                  for i, s in enumerate(RNG_STREAMS)}
    out = model.apply(variables, 3, 2, 4, train=False, rngs=apply_rngs,
                      method=model.walk)
    assert out.shape == (12, 16, 16, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_latent_navigate():
    """navigate(): endpoints decode to the same images as a direct
    encode->quantize->decode of x and y (linspace endpoints are exact),
    shapes/indices come back right, and the path interpolates."""
    import jax
    import jax.numpy as jnp
    from ctvae_tpu.models import vae_models
    from ctvae_tpu.models.base import RNG_STREAMS

    model = vae_models["CTMCQVAE"](
        in_channels=3, embedding_dim=8, action_dim=4, num_embeddings=8,
        hidden_dims=(8, 16), img_size=16, codebooks=2,
        causal_hidden_dims=(16, 8))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
    k = jax.random.PRNGKey(0)
    rngs = {"params": k, **{s: jax.random.fold_in(k, i + 1)
                            for i, s in enumerate(RNG_STREAMS)}}
    variables = model.init(rngs, x[None], train=False)

    steps = 3
    frames, inds = model.apply(variables, x, y, steps, True,
                               train=False, method=model.navigate)
    assert frames.shape == (steps + 2, 16, 16, 3)
    # MCQ indices: [S, C, h, w] with C=2 codebooks over a 4x4 grid
    assert inds.shape == (steps + 2, 2, 4, 4)
    assert bool(jnp.all(jnp.isfinite(frames)))

    # endpoints == direct encode -> quantize -> decode of x and y (the
    # navigate path bypasses the causal-transition layer, like the
    # reference's commented navigate does)
    def _direct(m, imgs):
        q, _ = m.vq_layer(m.encoder(imgs))
        return m.decoder(q)

    direct = model.apply(variables, jnp.stack([x, y]), method=_direct)
    np.testing.assert_allclose(np.asarray(frames[0]),
                               np.asarray(direct[0]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(frames[-1]),
                               np.asarray(direct[1]), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("noise", ["off", "exo", "endo"])
def test_identity_fast_path_matches_general(noise):
    """The closed-form identity pass (_compute_y_identity) must equal the
    general _compute_y under an identity adjacency — values and
    gradients (the GAT softmax over a single self-edge is identically 1,
    so lin_r/att/lin_edge receive zero gradient either way)."""
    ct = CausalTransition(input_dim=8, action_dim=4, latent_dims=(16, 8),
                          noise=noise)
    B, S, N = 2, 6, 8
    latent = jax.nn.one_hot(
        jnp.asarray(np.random.default_rng(3).integers(0, N, (B, S))), N)
    variables = ct.init({"params": jax.random.PRNGKey(0), **RNGS}, latent)
    action = jnp.zeros((B, 4), latent.dtype)
    mask = jnp.zeros((B, S, 1), latent.dtype)
    identity = jnp.broadcast_to(jnp.eye(S, dtype=latent.dtype), (B, S, S))

    def general(v):
        return ct.apply(v, latent, action, identity, mask, train=False,
                        rngs=RNGS, method=ct._compute_y)

    def fast(v):
        return ct.apply(v, latent, train=False, rngs=RNGS,
                        method=ct._compute_y_identity)

    np.testing.assert_allclose(np.asarray(fast(variables)),
                               np.asarray(general(variables)),
                               rtol=1e-6, atol=1e-6)
    g_gen = jax.grad(lambda v: jnp.sum(jnp.square(general(v))))(variables)
    g_fast = jax.grad(lambda v: jnp.sum(jnp.square(fast(v))))(variables)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_gen),
            jax.tree_util.tree_leaves_with_path(g_fast)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(kp))
