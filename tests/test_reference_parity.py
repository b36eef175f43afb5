"""Numerical parity vs the reference implementation executed on CPU torch.

SURVEY.md §7 ("Hard parts"): parity must be established numerically
against the reference run on CPU. These tests build identical inputs,
evaluate the reference's ``loss_function`` (torch, NCHW) and ours (JAX,
NHWC), and compare scalars. Skipped wholesale when /root/reference or
torch is unavailable.

The reference package imports torchvision/torch_geometric at package
scope; lightweight stubs are installed since no test here constructs
the DFC feature net or the torch-geometric GNN.
"""

import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_models():
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    # stub heavy optional deps the loss paths never touch
    for name in ["torchvision", "torchvision.models",
                 "torch_geometric", "torch_geometric.nn",
                 "torch_geometric.utils"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    for attr in ("vgg19_bn",):
        setattr(sys.modules["torchvision.models"], attr,
                lambda *a, **k: (_ for _ in ()).throw(RuntimeError("stub")))
    for attr in ("GATConv", "GATv2Conv"):
        setattr(sys.modules["torch_geometric.nn"], attr, object)
    setattr(sys.modules["torch_geometric.utils"], "dense_to_sparse", None)
    sys.path.insert(0, REF)
    try:
        import importlib
        mods = {n: importlib.import_module(f"models.{n}") for n in
                ["vanilla_vae", "beta_vae", "logcosh_vae", "iwae", "miwae",
                 "cat_vae", "joint_vae", "betatc_vae", "gamma_vae",
                 "vq_vae", "mcq_vae", "dip_vae", "mssim_vae",
                 "twostage_vae"]}
        yield mods
    finally:
        sys.path.remove(REF)


def _imgs(shape, seed=0):
    return np.random.default_rng(seed).uniform(size=shape).astype(np.float32)


def _nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def _ours(name, **kw):
    from ctvae_tpu.models import vae_models
    return vae_models[name](**kw)


def _close(a, b, rtol=1e-4, atol=1e-5):
    np.testing.assert_allclose(float(a), float(b), rtol=rtol, atol=atol)


def test_vanilla_loss_parity(ref_models):
    import jax.numpy as jnp
    B, D = 8, 6
    x, rec = _imgs((B, 16, 16, 3), 0), _imgs((B, 16, 16, 3), 1)
    rng = np.random.default_rng(2)
    mu = rng.normal(size=(B, D)).astype(np.float32)
    lv = (rng.normal(size=(B, D)) * 0.3).astype(np.float32)

    ref = ref_models["vanilla_vae"].VanillaVAE(3, D)
    r = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(mu),
                          torch.from_numpy(lv), M_N=0.005)
    ours = _ours("VanillaVAE", in_channels=3, latent_dim=D).loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "mu": jnp.asarray(mu), "log_var": jnp.asarray(lv)}, M_N=0.005)
    _close(r["loss"], ours["loss"])
    _close(r["Reconstruction_Loss"], ours["Reconstruction_Loss"])
    _close(r["KLD"], ours["KLD"])


def test_twostage_loss_parity(ref_models):
    """Stage-1 loss of the (reference-disabled) TwoStageVAE matches the
    reference exactly (/root/reference/models/twostage_vae.py:148-170 —
    identical to the VanillaVAE objective); stage 2 — the half upstream
    left dormant — trains a latent VAE on stop-gradient z."""
    import jax
    import jax.numpy as jnp
    from ctvae_tpu.models.twostage_vae import TwoStageVAE

    B, D = 8, 6
    x, rec = _imgs((B, 16, 16, 3), 7), _imgs((B, 16, 16, 3), 8)
    rng = np.random.default_rng(9)
    mu = rng.normal(size=(B, D)).astype(np.float32)
    lv = (rng.normal(size=(B, D)) * 0.3).astype(np.float32)

    ref = ref_models["twostage_vae"].TwoStageVAE(3, D)
    r = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(mu),
                          torch.from_numpy(lv), M_N=0.005)
    model = TwoStageVAE(in_channels=3, latent_dim=D, hidden_dims=(8, 16),
                        hidden_dims2=(16, 16), img_size=16)
    ours = model.loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "mu": jnp.asarray(mu), "log_var": jnp.asarray(lv)}, M_N=0.005)
    _close(r["loss"], ours["loss"])
    _close(r["Reconstruction_Loss"], ours["Reconstruction_Loss"])
    _close(r["KLD"], ours["KLD"])

    # full forward carries both stages' outputs; reference module tree
    # (encoder2/decoder2/fc_mu2/fc_var2, :75-98) exists in the pytree
    key = jax.random.PRNGKey(0)
    rngs = {"params": key, "reparam": key, "noise": key, "dropout": key,
            "gumbel": key}
    variables = model.init(rngs, jnp.asarray(x), train=True)
    for m in ("encoder2", "decoder2", "fc_mu2", "fc_var2"):
        assert m in variables["params"], m
    out = model.apply(variables, jnp.asarray(x), train=True, rngs=rngs,
                      mutable=["batch_stats"])[0]
    assert out["z_hat"].shape == (B, D)
    # stage-2 objective is finite and independent of the stage-1 graph
    l2 = model.loss_function(out, M_N=0.005)          # stage-1 selector
    model2 = TwoStageVAE(in_channels=3, latent_dim=D, hidden_dims=(8, 16),
                         hidden_dims2=(16, 16), img_size=16, train_stage=2)
    l2b = model2.loss_function(out, M_N=0.005)
    assert np.isfinite(float(l2["loss"]))
    assert np.isfinite(float(l2b["loss"]))
    assert float(l2b["Reconstruction_Loss"]) != float(l2["Reconstruction_Loss"])
    # two-stage sampling path produces images
    samp = model.apply(variables, method=lambda mdl: mdl.sample(
        4, two_stage=True), rngs=rngs)
    assert samp.shape == (4, 16, 16, 3)


def test_beta_vae_capacity_parity(ref_models):
    import jax.numpy as jnp
    B, D = 8, 6
    x, rec = _imgs((B, 16, 16, 3), 3), _imgs((B, 16, 16, 3), 4)
    rng = np.random.default_rng(5)
    mu = rng.normal(size=(B, D)).astype(np.float32)
    lv = (rng.normal(size=(B, D)) * 0.3).astype(np.float32)

    for step in (0, 137, 5000):
        ref = ref_models["beta_vae"].BetaVAE(
            3, D, loss_type="B", gamma=10.0, max_capacity=25,
            Capacity_max_iter=2000)
        ref.num_iter = step  # loss_function pre-increments (reference :132)
        r = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(mu),
                              torch.from_numpy(lv), M_N=0.005)
        ours = _ours("BetaVAE", in_channels=3, latent_dim=D, loss_type="B",
                     gamma=10.0, max_capacity=25.0,
                     Capacity_max_iter=2000).loss_function(
            {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
             "mu": jnp.asarray(mu), "log_var": jnp.asarray(lv)},
            M_N=0.005, step=step)
        _close(r["loss"], ours["loss"], rtol=1e-4)


def test_logcosh_loss_parity(ref_models):
    import jax.numpy as jnp
    B, D = 8, 6
    x, rec = _imgs((B, 16, 16, 3), 6), _imgs((B, 16, 16, 3), 7)
    rng = np.random.default_rng(8)
    mu = rng.normal(size=(B, D)).astype(np.float32)
    lv = (rng.normal(size=(B, D)) * 0.3).astype(np.float32)

    ref = ref_models["logcosh_vae"].LogCoshVAE(3, D, alpha=10.0, beta=1.0)
    r = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(mu),
                          torch.from_numpy(lv), M_N=0.005)
    ours = _ours("LogCoshVAE", in_channels=3, latent_dim=D, alpha=10.0,
                 beta=1.0).loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "mu": jnp.asarray(mu), "log_var": jnp.asarray(lv)}, M_N=0.005)
    _close(r["loss"], ours["loss"])
    _close(r["Reconstruction_Loss"], ours["Reconstruction_Loss"])


def test_iwae_miwae_loss_parity(ref_models):
    import jax.numpy as jnp
    B, S, M, D = 4, 5, 3, 6
    rng = np.random.default_rng(9)
    x = _imgs((B, 16, 16, 3), 9)

    # IWAE: recons [B,S,H,W,C] ours / [B,S,C,H,W] reference
    rec = _imgs((B, S, 16, 16, 3), 10)
    mu = rng.normal(size=(B, S, D)).astype(np.float32)
    lv = (rng.normal(size=(B, S, D)) * 0.3).astype(np.float32)
    z = rng.normal(size=(B, S, D)).astype(np.float32)
    ref = ref_models["iwae"].IWAE(3, D, num_samples=S)
    r = ref.loss_function(
        torch.from_numpy(np.moveaxis(rec, -1, 2).copy()), _nchw(x),
        torch.from_numpy(mu), torch.from_numpy(lv), torch.from_numpy(z),
        torch.from_numpy(z), M_N=0.005)
    ours = _ours("IWAE", in_channels=3, latent_dim=D,
                 num_samples=S).loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "mu": jnp.asarray(mu), "log_var": jnp.asarray(lv),
         "eps": jnp.asarray(z)}, M_N=0.005)
    _close(r["loss"], ours["loss"])
    _close(r["Reconstruction_Loss"], ours["Reconstruction_Loss"])

    # MIWAE: recons [B,M,S,H,W,C]
    rec = _imgs((B, M, S, 16, 16, 3), 11)
    mu = rng.normal(size=(B, M, S, D)).astype(np.float32)
    lv = (rng.normal(size=(B, M, S, D)) * 0.3).astype(np.float32)
    z = rng.normal(size=(B, M, S, D)).astype(np.float32)
    ref = ref_models["miwae"].MIWAE(3, D, num_samples=S, num_estimates=M)
    r = ref.loss_function(
        torch.from_numpy(np.moveaxis(rec, -1, 3).copy()), _nchw(x),
        torch.from_numpy(mu), torch.from_numpy(lv), torch.from_numpy(z),
        torch.from_numpy(z), M_N=0.005)
    ours = _ours("MIWAE", in_channels=3, latent_dim=D, num_samples=S,
                 num_estimates=M).loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "mu": jnp.asarray(mu), "log_var": jnp.asarray(lv),
         "eps": jnp.asarray(z)}, M_N=0.005)
    _close(r["loss"], ours["loss"])


def test_categorical_and_joint_loss_parity(ref_models):
    import jax.numpy as jnp
    B, D, Q = 4, 6, 5
    rng = np.random.default_rng(12)
    x, rec = _imgs((B, 16, 16, 3), 12), _imgs((B, 16, 16, 3), 13)
    q = rng.normal(size=(B, D, Q)).astype(np.float32)

    ref = ref_models["cat_vae"].CategoricalVAE(3, D, categorical_dim=Q,
                                               alpha=1.0)
    ref.eval()  # freeze temperature annealing
    r = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(q),
                          M_N=0.005, batch_idx=7)
    ours = _ours("CategoricalVAE", in_channels=3, latent_dim=D,
                 categorical_dim=Q, alpha=1.0).loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "q": jnp.asarray(q)}, M_N=0.005, step=7, train=False)
    _close(r["loss"], ours["loss"])
    _close(r["KLD"], ours["KLD"])

    # JointVAE at num_iter=0 (eval: counters frozen)
    qj = rng.normal(size=(B, Q)).astype(np.float32)
    mu = rng.normal(size=(B, D)).astype(np.float32)
    lv = (rng.normal(size=(B, D)) * 0.3).astype(np.float32)
    refj = ref_models["joint_vae"].JointVAE(
        3, D, categorical_dim=Q, latent_min_capacity=0.0,
        latent_max_capacity=20.0, latent_gamma=10.0, latent_num_iter=100,
        categorical_min_capacity=0.0, categorical_max_capacity=20.0,
        categorical_gamma=10.0, categorical_num_iter=100,
        temperature=0.5, anneal_rate=3e-5, anneal_interval=100, alpha=10.0)
    refj.eval()
    rj = refj.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(qj),
                            torch.from_numpy(mu), torch.from_numpy(lv),
                            M_N=0.005, batch_idx=7)
    oursj = _ours("JointVAE", in_channels=3, latent_dim=D,
                  categorical_dim=Q, latent_min_capacity=0.0,
                  latent_max_capacity=20.0, latent_gamma=10.0,
                  latent_num_iter=100, categorical_min_capacity=0.0,
                  categorical_max_capacity=20.0, categorical_gamma=10.0,
                  categorical_num_iter=100, temperature=0.5,
                  anneal_rate=3e-5, anneal_interval=100,
                  alpha=10.0).loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "q": jnp.asarray(qj), "mu": jnp.asarray(mu),
         "log_var": jnp.asarray(lv)}, M_N=0.005, step=0, train=False)
    _close(rj["loss"], oursj["loss"])
    _close(rj["Capacity_Loss"], oursj["Capacity_Loss"])


def test_betatc_loss_parity(ref_models):
    import jax.numpy as jnp
    B, D = 8, 6
    rng = np.random.default_rng(14)
    x, rec = _imgs((B, 16, 16, 3), 14), _imgs((B, 16, 16, 3), 15)
    mu = rng.normal(size=(B, D)).astype(np.float32)
    lv = (rng.normal(size=(B, D)) * 0.3).astype(np.float32)
    z = rng.normal(size=(B, D)).astype(np.float32)

    ref = ref_models["betatc_vae"].BetaTCVAE(3, D, anneal_steps=100,
                                             alpha=1.0, beta=6.0, gamma=1.0)
    ref.eval()  # anneal_rate = 1
    r = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(mu),
                          torch.from_numpy(lv), torch.from_numpy(z),
                          M_N=0.005)
    ours = _ours("BetaTCVAE", in_channels=3, latent_dim=D, anneal_steps=100,
                 alpha=1.0, beta=6.0, gamma=1.0).loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "mu": jnp.asarray(mu), "log_var": jnp.asarray(lv),
         "z": jnp.asarray(z)}, M_N=0.005, train=False)
    _close(r["loss"], ours["loss"], rtol=1e-4)
    _close(r["TC_Loss"], ours["TC_Loss"], rtol=1e-4)
    _close(r["MI_Loss"], ours["MI_Loss"], rtol=1e-4)


def test_gamma_vae_kl_parity(ref_models):
    import jax.numpy as jnp
    B, D = 8, 6
    rng = np.random.default_rng(16)
    x, rec = _imgs((B, 16, 16, 3), 16), _imgs((B, 16, 16, 3), 17)
    a = (rng.uniform(1.0, 3.0, size=(B, D))).astype(np.float32)
    b = (rng.uniform(0.5, 2.0, size=(B, D))).astype(np.float32)

    ref = ref_models["gamma_vae"].GammaVAE(3, D, gamma_shape=8.0,
                                           prior_shape=2.0, prior_rate=1.0)
    r = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(a),
                          torch.from_numpy(b), M_N=0.005)
    ours = _ours("GammaVAE", in_channels=3, latent_dim=D, gamma_shape=8.0,
                 prior_shape=2.0, prior_rate=1.0).loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "alpha": jnp.asarray(a), "beta": jnp.asarray(b)}, M_N=0.005)
    _close(r["loss"], ours["loss"], rtol=1e-3)


def test_vq_quantizer_parity(ref_models):
    """Same codebook weights + latents => same quantized output, same
    commitment/embedding losses (reference vq_vae.py:24-55)."""
    import jax.numpy as jnp
    from ctvae_tpu.models.quantizers import VectorQuantizerMS

    K, D, B, H, W = 16, 8, 4, 5, 5
    rng = np.random.default_rng(18)
    emb = rng.uniform(-1 / K, 1 / K, size=(K, D)).astype(np.float32)
    lat = rng.normal(size=(B, H, W, D)).astype(np.float32)

    ref = ref_models["vq_vae"].VectorQuantizer(K, D, beta=0.25)
    with torch.no_grad():
        ref.embedding.weight.copy_(torch.from_numpy(emb))
    # reference takes [B, D, H, W]
    rq, rloss = ref(torch.from_numpy(np.moveaxis(lat, -1, 1).copy()))

    import flax.linen as nn
    q = VectorQuantizerMS(num_embeddings=K, embedding_dim=D, beta=0.25)
    variables = {"params": {"embedding": jnp.asarray(emb)}}
    oq, oloss = q.apply(variables, jnp.asarray(lat))

    np.testing.assert_allclose(np.moveaxis(rq.detach().numpy(), 1, -1),
                               np.asarray(oq), rtol=1e-4, atol=1e-5)
    _close(rloss, oloss, rtol=1e-4)


def test_mcq_inds_parity(ref_models):
    """Multi-codebook compute_inds including the reference's stride-1
    sub-latent slicing quirk (mcq_vae.py:104,117) in slicing='overlap'
    mode, and our corrected chunked mode differing by design."""
    import jax.numpy as jnp
    from ctvae_tpu.models.quantizers import MultipleCodebookVectorQuantizer

    K, D, C, B, H, W = 8, 8, 2, 3, 4, 4
    rng = np.random.default_rng(19)
    lat = rng.normal(size=(B, H, W, D)).astype(np.float32)

    ref = ref_models["mcq_vae"].MultipleCodebookVectorQuantizer(
        K, D, C, beta=0.25)
    embs = []
    for i, vq in enumerate(ref.quantizers):
        w = rng.uniform(-1 / K, 1 / K,
                        size=(K, D // C)).astype(np.float32)
        with torch.no_grad():
            vq.embedding.weight.copy_(torch.from_numpy(w))
        embs.append(w)
    r_inds = ref.compute_inds(
        torch.from_numpy(np.moveaxis(lat, -1, 1).copy()))  # [B, C, H, W]

    q = MultipleCodebookVectorQuantizer(
        num_embeddings=K, embedding_dim=D, codebooks=C, beta=0.25,
        slicing="overlap")
    variables = {"params": {f"quantizers_{i}": {"embedding": jnp.asarray(w)}
                            for i, w in enumerate(embs)}}
    o_inds = q.apply(variables, jnp.asarray(lat), method=q.compute_inds)
    np.testing.assert_array_equal(r_inds.numpy(),
                                  np.asarray(o_inds))


def test_lvae_merge_and_kl_parity(ref_models):
    """LVAE precision-weighted posterior merge + rung KL divergence
    (reference lvae.py:173-195) — pure functions, compared directly."""
    import importlib
    import jax.numpy as jnp
    from ctvae_tpu.models.lvae import kl_divergence, merge_gauss

    lvae_mod = importlib.import_module("models.lvae")
    ref = lvae_mod.LVAE(3, [4, 8], [32, 64])
    rng = np.random.default_rng(20)
    B, D = 6, 4
    mu1, mu2 = (rng.normal(size=(B, D)).astype(np.float32) for _ in range(2))
    lv1, lv2 = ((rng.normal(size=(B, D)) * 0.4).astype(np.float32)
                for _ in range(2))

    r_mu, r_lv = ref.merge_gauss(torch.from_numpy(mu1), torch.from_numpy(mu2),
                                 torch.from_numpy(lv1), torch.from_numpy(lv2))
    o_mu, o_lv = merge_gauss(jnp.asarray(mu1), jnp.asarray(mu2),
                             jnp.asarray(lv1), jnp.asarray(lv2))
    np.testing.assert_allclose(np.asarray(o_mu), r_mu.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(o_lv), r_lv.numpy(), rtol=1e-5)

    z = rng.normal(size=(B, D)).astype(np.float32)
    r_kl = ref.compute_kl_divergence(
        torch.from_numpy(z), (torch.from_numpy(mu1), torch.from_numpy(lv1)),
        (torch.from_numpy(mu2), torch.from_numpy(lv2)))
    o_kl = kl_divergence(jnp.asarray(mu1), jnp.asarray(lv1),
                         jnp.asarray(mu2), jnp.asarray(lv2))
    np.testing.assert_allclose(np.asarray(o_kl), r_kl.numpy(), rtol=1e-4)


def test_dip_reference_quirk_parity(ref_models):
    """variance_term="reference" reproduces the reference's scalar
    E[Sigma] collapse (dip_vae.py:152) exactly."""
    import jax.numpy as jnp
    B, D = 8, 6
    rng = np.random.default_rng(21)
    x, rec = _imgs((B, 16, 16, 3), 21), _imgs((B, 16, 16, 3), 22)
    mu = rng.normal(size=(B, D)).astype(np.float32)
    lv = (rng.normal(size=(B, D)) * 0.3).astype(np.float32)

    ref = ref_models["dip_vae"].DIPVAE(3, D, lambda_diag=10.0,
                                       lambda_offdiag=5.0)
    r = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(mu),
                          torch.from_numpy(lv), M_N=0.005)
    ours = _ours("DIPVAE", in_channels=3, latent_dim=D,
                 variance_term="reference").loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "mu": jnp.asarray(mu), "log_var": jnp.asarray(lv)}, M_N=0.005)
    _close(r["loss"], ours["loss"], rtol=1e-4)
    _close(r["DIP_Loss"], ours["DIP_Loss"], rtol=1e-4)

    # and the paper-mode term is genuinely different on the same inputs
    paper = _ours("DIPVAE", in_channels=3, latent_dim=D).loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "mu": jnp.asarray(mu), "log_var": jnp.asarray(lv)}, M_N=0.005)
    assert abs(float(paper["DIP_Loss"]) - float(r["DIP_Loss"])) > 1e-3


def test_mssim_reference_quirk_parity(ref_models):
    """window_mode="reference" + normalize=False reproduces the
    reference MSSIM loss (inverted window, raw fractional powers)."""
    import jax.numpy as jnp
    B, D = 4, 6
    rng = np.random.default_rng(23)
    x = _imgs((B, 64, 64, 3), 23)
    # correlated recons so sim/cs stay positive (as in real training)
    rec = np.clip(x + rng.normal(size=x.shape).astype(np.float32) * 0.05,
                  0, 1)
    mu = rng.normal(size=(B, D)).astype(np.float32)
    lv = (rng.normal(size=(B, D)) * 0.3).astype(np.float32)

    ref = ref_models["mssim_vae"].MSSIMVAE(3, D)
    r = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(mu),
                          torch.from_numpy(lv), M_N=0.005)
    ours = _ours("MSSIMVAE", in_channels=3, latent_dim=D,
                 window_mode="reference", normalize=False).loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "mu": jnp.asarray(mu), "log_var": jnp.asarray(lv)}, M_N=0.005)
    _close(r["loss"], ours["loss"], rtol=1e-4)
    _close(r["Reconstruction_Loss"], ours["Reconstruction_Loss"], rtol=1e-4)
