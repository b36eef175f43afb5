"""CT-VAE numerical parity vs the reference CausalTransition on CPU.

The reference runs with its REAL GNN path: ``torch_geometric`` is
provided by tests/pyg_fixture.py, a faithful torch implementation of
PyG v2.2's GATv2Conv / dense_to_sparse / Sequential (itself pinned in
tests/test_gat_vs_pyg.py). With transplanted weights this pins, against
ground truth: the factorized pairwise scorer, the mask pre-activation,
the deterministic regularizers, the full ``_compute_y`` GNN pass
(padding, self-loop replacement, edge attrs, multi-head concat,
action-head selection, softmax — /root/reference/models/ct_mcq_vae.py:188-228),
and a fully deterministic end-to-end ``forward_action``.
"""

import sys

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")

from _pyg_install import (install_torch_geometric,  # noqa: E402
                          install_torchvision_stub)


@pytest.fixture(scope="module")
def ref_ct_module():
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    install_torchvision_stub()
    install_torch_geometric()
    sys.path.insert(0, REF)
    try:
        import importlib
        # NB: no reload needed even if another parity file imported the
        # reference first with bare stubs — install_torch_geometric
        # mutates the registered module objects in place, and the
        # reference looks the classes up at construction time.
        yield importlib.import_module("models.ct_mcq_vae")
    finally:
        sys.path.remove(REF)


def _build_pair(ref_ct_module, N=6, A=4, H=16, seed=0):
    """Reference CausalTransition + our params dict with copied weights."""
    import jax.numpy as jnp
    from ctvae_tpu.models.ct_vae import CausalTransition

    ref = ref_ct_module.CausalTransition(
        input_dim=N, action_dim=A, latent_dims=[H, 8])
    ref.eval()

    ours = CausalTransition(input_dim=N, action_dim=A,
                            latent_dims=(H, 8), max_len=64)
    import jax
    rng = jax.random.PRNGKey(seed)
    lat0 = jnp.zeros((2, 5, N))
    variables = ours.init(
        {"params": rng, **{s: jax.random.fold_in(rng, i) for i, s in
                           enumerate(("reparam", "gumbel", "noise", "dropout"))}},
        lat0, train=False)
    params = dict(variables["params"])

    w1l = np.zeros((A + 1, N, H), np.float32)
    w1r = np.zeros((A + 1, N, H), np.float32)
    b1 = np.zeros((A + 1, H), np.float32)
    w2 = np.zeros((A + 1, H, 1), np.float32)
    b2 = np.zeros((A + 1, 1), np.float32)
    for i, disc in enumerate(ref.graph_discovers):
        lin1, lin2 = disc[0], disc[2]
        W = lin1.weight.detach().numpy()          # [H, 2N]
        w1l[i] = W[:, :N].T
        w1r[i] = W[:, N:].T
        b1[i] = lin1.bias.detach().numpy()
        w2[i] = lin2.weight.detach().numpy().T    # [H, 1]
        b2[i] = lin2.bias.detach().numpy()
    params["disc_w1l"] = jnp.asarray(w1l)
    params["disc_w1r"] = jnp.asarray(w1r)
    params["disc_b1"] = jnp.asarray(b1)
    params["disc_w2"] = jnp.asarray(w2)
    params["disc_b2"] = jnp.asarray(b2)

    mask_lin = ref.mask[0]
    params["mask_kernel"] = jnp.asarray(mask_lin.weight.detach().numpy().T)
    params["mask_bias"] = jnp.asarray(mask_lin.bias.detach().numpy())

    # GNN path: a_dense + every GATv2 layer of the graph_transitioner
    params["a_dense"] = {
        "kernel": jnp.asarray(ref.a_dense.weight.detach().numpy().T),
        "bias": jnp.asarray(ref.a_dense.bias.detach().numpy())}
    import pyg_fixture
    convs = [m for m in ref.graph_transitioner._mods
             if isinstance(m, pyg_fixture.GATv2Conv)]
    params["graph_transitioner"] = {
        f"DenseGATv2Layer_{i}": {
            "lin_l": {"kernel": jnp.asarray(c.lin_l.weight.detach().numpy().T),
                      "bias": jnp.asarray(c.lin_l.bias.detach().numpy())},
            "lin_r": {"kernel": jnp.asarray(c.lin_r.weight.detach().numpy().T),
                      "bias": jnp.asarray(c.lin_r.bias.detach().numpy())},
            "lin_edge": jnp.asarray(c.lin_edge.weight.detach().numpy().T),
            "att": jnp.asarray(c.att.detach().numpy()[0]),
            "bias": jnp.asarray(c.bias.detach().numpy()),
        } for i, c in enumerate(convs)}
    return ref, ours, {"params": params}


def test_compute_adj_parity(ref_ct_module):
    """Factorized pairwise scorer == reference concat-MLP, per-sample
    action-selected discoverer, mask mixing, both comp and mem paths."""
    import jax
    import jax.numpy as jnp

    N, A, H, B, S = 6, 4, 16, 3, 5
    ref, ours, variables = _build_pair(ref_ct_module, N, A, H)
    rng = np.random.default_rng(1)
    lat = rng.normal(size=(B, S, N)).astype(np.float32)
    action = np.eye(A, dtype=np.float32)[rng.integers(0, A, B)]
    mask = (rng.uniform(size=(B, S, 1)) > 0.5).astype(np.float32)

    t_lat = torch.from_numpy(lat)
    t_act = torch.from_numpy(action)
    t_mask = torch.from_numpy(mask)
    with torch.no_grad():
        r_comp = ref._compute_adj__comp_optim(t_lat, t_act, t_mask).numpy()
        r_mem = ref._compute_adj__mem_optim(t_lat, t_act, t_mask).numpy()
    np.testing.assert_allclose(r_comp, r_mem, rtol=1e-5, atol=1e-6)

    o = ours.apply(variables, jnp.asarray(lat), jnp.asarray(action),
                   jnp.asarray(mask), method=ours._compute_adj)
    np.testing.assert_allclose(np.asarray(o), r_comp, rtol=1e-4, atol=1e-5)

    # blockwise path (the Pallas-style tiling knob) must be identical
    ours_blocked = ours.clone(pairwise_block_rows=2)
    ob = ours_blocked.apply(variables, jnp.asarray(lat),
                            jnp.asarray(action), jnp.asarray(mask),
                            method=ours_blocked._compute_adj)
    np.testing.assert_allclose(np.asarray(ob), r_comp, rtol=1e-4, atol=1e-5)


def test_mask_preactivation_parity(ref_ct_module):
    """The sigmoid mask scores (before Gumbel sampling) must match:
    sigmoid(Linear([action || pos_embed]))."""
    import jax
    import jax.numpy as jnp

    N, A, H, B, S = 6, 4, 16, 3, 5
    ref, ours, variables = _build_pair(ref_ct_module, N, A, H, seed=2)
    rng = np.random.default_rng(3)
    one_hot = np.eye(N, dtype=np.float32)[
        rng.integers(0, N, (B, S))]
    action = np.eye(A, dtype=np.float32)[rng.integers(0, A, B)]

    with torch.no_grad():
        t_act = torch.from_numpy(action).unsqueeze(1).repeat(1, S, 1)
        pos = ref.pos_encoding(torch.zeros((B, S, N)))
        inter_mask = ref.mask(torch.concat([t_act, pos], dim=-1))
        r_scores = (torch.from_numpy(one_hot) * inter_mask).sum(-1).numpy()

    def _scores(m, lat, act):
        a_rep = jnp.repeat(act[:, None, :], lat.shape[1], axis=1)
        pos_embed = m.pos_encoding(jnp.zeros_like(lat), train=False)
        import jax.nn
        pre = jnp.concatenate([a_rep, pos_embed], -1) @ m.mask_kernel \
            + m.mask_bias
        return jnp.sum(lat * jax.nn.sigmoid(pre), axis=-1)

    o_scores = ours.apply(variables, jnp.asarray(one_hot),
                          jnp.asarray(action), method=_scores)
    np.testing.assert_allclose(np.asarray(o_scores), r_scores, rtol=1e-4,
                               atol=1e-5)


def test_compute_y_full_parity(ref_ct_module):
    """The full GNN transition — support-node padding, dense_to_sparse
    edge attrs, PyG self-loop replacement, multi-head GATv2 stack,
    action-head selection, mask mixing, softmax — against the reference
    ``_compute_y`` running its real (fixture-backed) torch-geometric
    path (/root/reference/models/ct_mcq_vae.py:188-228)."""
    import jax.numpy as jnp

    N, A, H, B, S = 6, 4, 16, 3, 5
    ref, ours, variables = _build_pair(ref_ct_module, N, A, H, seed=6)
    assert ref.noise == "off"
    rng = np.random.default_rng(7)
    latent = rng.normal(size=(B, S, N)).astype(np.float32)
    action = np.eye(A, dtype=np.float32)[rng.integers(0, A, B)]
    mask = (rng.uniform(size=(B, S, 1)) > 0.5).astype(np.float32)
    adj = rng.uniform(0.05, 1.0, size=(B, S, S)).astype(np.float32)
    adj *= (rng.uniform(size=(B, S, S)) < 0.5)  # sparse, incl. diagonal

    with torch.no_grad():
        r_y = ref._compute_y(torch.from_numpy(latent),
                             torch.from_numpy(action),
                             torch.from_numpy(adj),
                             torch.from_numpy(mask)).numpy()
    o_y = ours.apply(variables, jnp.asarray(latent), jnp.asarray(action),
                     jnp.asarray(adj), jnp.asarray(mask),
                     method=ours._compute_y, train=False)
    np.testing.assert_allclose(np.asarray(o_y), r_y, rtol=1e-3, atol=1e-5)


def test_forward_action_full_parity(ref_ct_module, monkeypatch):
    """End-to-end forward_action with BOTH frameworks' Gumbel samplers
    patched to the same deterministic threshold (p > 0.5): the mask,
    adjacency, sampled graph, GNN output, and the deterministic
    regularizers (c_beta=0 kills the random-target KL) must all agree."""
    import jax
    import jax.numpy as jnp

    import ctvae_tpu.models.ct_vae as ct_mod

    N, A, H, B, S = 6, 4, 16, 2, 5
    ref, ours, variables = _build_pair(ref_ct_module, N, A, H, seed=8)
    ref.beta = 0.0
    ours = ours.clone(c_beta=0.0)
    ref.eval()

    # deterministic "sampling" on both sides: hard threshold at 0.5.
    # torch: gumbel_softmax(log[1-p, p], hard=True) -> argmax -> p > 0.5
    monkeypatch.setattr(
        torch.nn.functional, "gumbel_softmax",
        lambda logits, tau=1.0, hard=True, **kw: torch.nn.functional.one_hot(
            logits.argmax(dim=-1), logits.size(-1)).to(logits.dtype))
    monkeypatch.setattr(
        ct_mod, "st_bernoulli_gumbel",
        lambda rng, probs, tau=1.0: (probs > 0.5).astype(probs.dtype))

    rng = np.random.default_rng(9)
    latent = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, S, N)).astype(np.float32)) * 2,
        axis=-1)
    latent = np.asarray(latent)
    action = np.eye(A, dtype=np.float32)[rng.integers(0, A, B)]

    # reference takes NCHW one-hot [B, N, h, w]; use h=1, w=S
    t_lat = torch.from_numpy(latent).permute(0, 2, 1).reshape(B, N, 1, S)
    with torch.no_grad():
        r_y, r_reg, r_metrics = ref.forward_action(
            t_lat, torch.from_numpy(action))
    r_y = r_y.reshape(B, N, S).permute(0, 2, 1).numpy()

    rngs = {s: jax.random.PRNGKey(i)
            for i, s in enumerate(("reparam", "gumbel", "noise", "dropout"))}
    o_y, o_reg, o_metrics = ours.apply(
        variables, jnp.asarray(latent), jnp.asarray(action),
        method=ours.forward_action, train=False, rngs=rngs)

    np.testing.assert_allclose(np.asarray(o_y), r_y, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(float(o_reg), float(r_reg), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(o_metrics["ct_mask"]).ravel(),
                               r_metrics["ct_mask"].numpy().ravel(),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(o_metrics["ct_adjacency"]),
                               r_metrics["ct_adjacency"].numpy(),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mode", ["base", "action", "causal"])
def test_full_model_loss_and_grad_parity(ref_ct_module, monkeypatch, mode):
    """Full CTMCQVAE — encoder, MCQ quantizer (reference overlap
    slicing), causal transition with its real GNN, decoder — loss AND
    parameter gradients vs the reference at a transplanted state, per
    mode. Float64, deterministic samplers, pinned KL targets."""
    import jax
    import jax.numpy as jnp

    import ctvae_tpu.models.ct_vae as ct_mod
    import torch_transplant as tt
    from ctvae_tpu.models import vae_models

    jax.config.update("jax_enable_x64", True)
    prev_dtype = torch.get_default_dtype()
    # the reference allocates helper tensors with the default dtype
    # mid-forward (e.g. _merge_inter's zeros, ct_mcq_vae.py:137)
    torch.set_default_dtype(torch.float64)
    try:
        _full_model_parity(ref_ct_module, monkeypatch, mode, jax, jnp,
                           ct_mod, tt, vae_models)
    finally:
        torch.set_default_dtype(prev_dtype)
        jax.config.update("jax_enable_x64", False)


def _full_model_parity(ref_ct_module, monkeypatch, mode, jax, jnp,
                       ct_mod, tt, vae_models):
    B, IMG, D, K, A, C = 4, 16, 8, 8, 4, 2
    HDIMS, CHDIMS, GAMMA = [16, 32], [16, 8], 1.5
    S = (IMG // 4) ** 2 * C
    rng = np.random.default_rng(11)
    x_np = rng.uniform(size=(B, IMG, IMG, 3))
    y_np = rng.uniform(size=(B, IMG, IMG, 3))
    act_np = np.eye(A)[rng.integers(0, A, B)].astype(np.float64)
    klt = rng.uniform(size=(A * B, S * S))

    torch.manual_seed(11)
    ref = ref_ct_module.CTMCQVAE(
        in_channels=3, embedding_dim=D, action_dim=A,
        num_embeddings=K, hidden_dims=list(HDIMS),
        causal_hidden_dims=list(CHDIMS), gamma=GAMMA, img_size=IMG,
        codebooks=C).double()
    ref.ct_layer.pos_encoding.dropout.p = 0.0
    params = {
        "encoder": tt.vq_encoder(tt.flatten_sequential(ref.encoder)),
        "decoder": tt.vq_decoder(tt.flatten_sequential(ref.decoder)),
        "vq_layer": tt.multi_codebook_vq(ref.vq_layer),
        "ct_layer": tt.causal_transition(ref.ct_layer, K, A),
    }

    monkeypatch.setattr(
        torch.nn.functional, "gumbel_softmax",
        lambda logits, tau=1.0, hard=True, **kw: torch.nn.functional.one_hot(
            logits.argmax(dim=-1), logits.size(-1)).to(logits.dtype))
    monkeypatch.setattr(
        ct_mod, "st_bernoulli_gumbel",
        lambda r, probs, tau=1.0: (probs > 0.5).astype(probs.dtype))
    monkeypatch.setattr(
        torch, "rand",
        lambda *sh, **kw: torch.from_numpy(
            klt[:(sh[0][0] if isinstance(sh[0], (tuple, torch.Size))
                 else sh[0])].copy()))
    orig_to = torch.Tensor.to

    def fake_to(self, *args, **kwargs):
        args = tuple(torch.float64 if a is torch.float32 else a
                     for a in args)
        if kwargs.get("dtype") is torch.float32:
            kwargs = {**kwargs, "dtype": torch.float64}
        return orig_to(self, *args, **kwargs)

    monkeypatch.setattr(torch.Tensor, "to", fake_to)

    def nchw(a):
        return torch.from_numpy(np.moveaxis(a, -1, 1).copy())

    ref.train()
    out = ref.forward(nchw(x_np), input_y=nchw(y_np),
                      action=torch.from_numpy(act_np), mode=mode)
    r_losses = ref.loss_function(*out, M_N=0.00025)
    r_losses["loss"].backward()
    t_norms = {}
    for name, p in ref.named_parameters():
        if p.grad is not None:
            t_norms[name] = float((p.grad.detach() ** 2).sum())

    model = vae_models["CTMCQVAE"](
        in_channels=3, embedding_dim=D, action_dim=A, num_embeddings=K,
        hidden_dims=HDIMS, causal_hidden_dims=CHDIMS, gamma=GAMMA,
        img_size=IMG, codebooks=C, slicing="overlap", ct_dropout_rate=0.0,
        dtype=jnp.float64)
    orig_uniform = jax.random.uniform

    def fake_uniform(key, shape=(), *a, **kw):
        if len(shape) == 2 and shape[-1] == S * S:
            return jnp.asarray(klt[:shape[0]])
        return orig_uniform(key, shape, *a, **kw)

    monkeypatch.setattr(jax.random, "uniform", fake_uniform)
    jp = jax.tree_util.tree_map(lambda a: jnp.asarray(a, jnp.float64),
                                params)
    rngs = {s: jax.random.PRNGKey(i) for i, s in
            enumerate(("reparam", "gumbel", "noise", "dropout"))}

    def loss_fn(p):
        o = model.apply({"params": p}, jnp.asarray(x_np),
                        input_y=jnp.asarray(y_np),
                        action=jnp.asarray(act_np), mode=mode,
                        train=True, rngs=rngs)
        return model.loss_function(o)["loss"]

    loss_j, grads = jax.value_and_grad(loss_fn)(jp)
    np.testing.assert_allclose(float(loss_j), float(r_losses["loss"]),
                               rtol=1e-10)

    def tot(tree):
        return sum(float(jnp.sum(jnp.square(g)))
                   for g in jax.tree_util.tree_leaves(tree))

    groups = {
        "encoder": grads["encoder"], "decoder": grads["decoder"],
        "vq_layer": grads["vq_layer"],
        "ct_layer.graph_discovers": {
            k: v for k, v in grads["ct_layer"].items()
            if k.startswith("disc")},
        "ct_layer.mask": {k: v for k, v in grads["ct_layer"].items()
                          if k.startswith("mask")},
        "ct_layer.a_dense": grads["ct_layer"]["a_dense"],
        "ct_layer.graph_transitioner":
            grads["ct_layer"]["graph_transitioner"],
    }
    for prefix, sub in groups.items():
        t_val = sum(v for k, v in t_norms.items() if k.startswith(prefix))
        j_val = tot(sub)
        np.testing.assert_allclose(
            j_val, t_val, rtol=1e-8, atol=1e-24,
            err_msg=f"grad-norm mismatch in {prefix} (mode={mode})")


def test_regularizer_parity(ref_ct_module):
    """graph_size and positive_trial are deterministic — exact match.
    (adjacency_KL uses internal random targets on both sides; excluded.)"""
    import jax.numpy as jnp
    from ctvae_tpu.models.ct_vae import CausalTransition

    rng = np.random.default_rng(4)
    adj = rng.uniform(0.05, 0.95, size=(3, 5, 5)).astype(np.float32)
    graph = (adj > 0.5).astype(np.float32)
    ref = ref_ct_module.CausalTransition(input_dim=4, action_dim=2,
                                         latent_dims=[8, 4])
    with torch.no_grad():
        r_size = float(ref.graph_size_loss(torch.from_numpy(graph)))
        r_pos = float(ref.positive_trial_loss(torch.from_numpy(adj)))
    o_size = float(CausalTransition.graph_size_loss(jnp.asarray(graph)))
    o_pos = float(CausalTransition.positive_trial_loss(jnp.asarray(adj)))
    np.testing.assert_allclose(o_size, r_size, rtol=1e-5)
    np.testing.assert_allclose(o_pos, r_pos, rtol=1e-5)


def test_causal_accuracy_parity(ref_ct_module):
    import jax.numpy as jnp
    from ctvae_tpu.models.ct_vae import CausalTransition

    rng = np.random.default_rng(5)
    A, B = 6, 32
    probas = rng.uniform(size=(B, A)).astype(np.float32)
    action = np.eye(A, dtype=np.float32)[rng.integers(0, A, B)]
    ref = ref_ct_module.CausalTransition(input_dim=4, action_dim=A,
                                         latent_dims=[8, 4])
    with torch.no_grad():
        r_acc = float(ref.causal_accuracy(torch.from_numpy(probas),
                                          torch.from_numpy(action)))
        r_nodir = float(ref.causal_undirected_accuracy(
            torch.from_numpy(probas), torch.from_numpy(action)))
    o_acc = float(CausalTransition.causal_accuracy(
        jnp.asarray(probas), jnp.asarray(action)))
    o_nodir = float(CausalTransition.causal_undirected_accuracy(
        jnp.asarray(probas), jnp.asarray(action)))
    assert o_acc == pytest.approx(r_acc)
    assert o_nodir == pytest.approx(r_nodir)
