"""Parity for losses with internal randomness, with the random draws
pinned identically on both sides: InfoVAE / WAE-MMD full losses, SWAE's
sliced-Wasserstein distance, and FactorVAE's two-phase adversarial loss
(discriminator output pinned, isolating the loss formulas and the
optimizer-phase protocol)."""

import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref_mods():
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference checkout not available")
    for name in ["torchvision", "torchvision.models",
                 "torch_geometric", "torch_geometric.nn",
                 "torch_geometric.utils"]:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    if not hasattr(sys.modules["torchvision.models"], "vgg19_bn"):
        sys.modules["torchvision.models"].vgg19_bn = lambda *a, **k: None
    sys.path.insert(0, REF)
    try:
        import importlib
        yield {n: importlib.import_module(f"models.{n}")
               for n in ["info_vae", "wae_mmd", "swae", "fvae"]}
    finally:
        sys.path.remove(REF)


def _imgs(shape, seed):
    return np.random.default_rng(seed).uniform(size=shape).astype(np.float32)


def _nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def _close(a, b, rtol=1e-4, atol=1e-5):
    np.testing.assert_allclose(float(a), float(b), rtol=rtol, atol=atol)


def _pin_randn_like(value):
    orig = torch.randn_like
    torch.randn_like = lambda t, **k: torch.from_numpy(value)
    return orig


def test_infovae_wae_loss_parity(ref_mods):
    import jax.numpy as jnp
    from ctvae_tpu.models import vae_models

    B, D = 8, 6
    rng = np.random.default_rng(0)
    x, rec = _imgs((B, 16, 16, 3), 0), _imgs((B, 16, 16, 3), 1)
    mu = rng.normal(size=(B, D)).astype(np.float32)
    lv = (rng.normal(size=(B, D)) * 0.3).astype(np.float32)
    z = rng.normal(size=(B, D)).astype(np.float32)
    prior = rng.normal(size=(B, D)).astype(np.float32)

    ref = ref_mods["info_vae"].InfoVAE(3, D, reg_weight=110,
                                       kernel_type="imq", alpha=-9.0,
                                       beta=10.5)
    orig = _pin_randn_like(prior)
    try:
        r = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(z),
                              torch.from_numpy(mu), torch.from_numpy(lv),
                              M_N=0.005)
    finally:
        torch.randn_like = orig
    ours = vae_models["InfoVAE"](
        in_channels=3, latent_dim=D, reg_weight=110, kernel_type="imq",
        alpha=-9.0, beta=10.5).loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "z": jnp.asarray(z), "mu": jnp.asarray(mu),
         "log_var": jnp.asarray(lv)}, M_N=0.005,
        prior_z=jnp.asarray(prior))
    _close(r["loss"], ours["loss"])
    _close(r["MMD"], ours["MMD"])

    refw = ref_mods["wae_mmd"].WAE_MMD(3, D, reg_weight=5000,
                                       kernel_type="rbf")
    orig = _pin_randn_like(prior)
    try:
        rw = refw.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(z),
                                M_N=0.005)
    finally:
        torch.randn_like = orig
    oursw = vae_models["WAE_MMD"](
        in_channels=3, latent_dim=D, reg_weight=5000,
        kernel_type="rbf").loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "z": jnp.asarray(z)}, prior_z=jnp.asarray(prior))
    _close(rw["loss"], oursw["loss"])
    _close(rw["MMD"], oursw["MMD"])


def test_swae_swd_parity(ref_mods):
    import jax.numpy as jnp
    from ctvae_tpu.models import vae_models

    B, D, S = 8, 6, 20
    rng = np.random.default_rng(2)
    x, rec = _imgs((B, 16, 16, 3), 2), _imgs((B, 16, 16, 3), 3)
    z = rng.normal(size=(B, D)).astype(np.float32)
    prior = rng.normal(size=(B, D)).astype(np.float32)
    raw_proj = rng.normal(size=(S, D)).astype(np.float32)
    unit_proj = raw_proj / np.linalg.norm(raw_proj, axis=1, keepdims=True)

    ref = ref_mods["swae"].SWAE(3, D, reg_weight=100, wasserstein_deg=2.0,
                                num_projections=S, projection_dist="normal")
    orig_like = _pin_randn_like(prior)
    orig_randn = torch.randn
    torch.randn = lambda *shape, **k: torch.from_numpy(raw_proj)
    try:
        r = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(z),
                              M_N=0.005)
    finally:
        torch.randn_like = orig_like
        torch.randn = orig_randn

    ours = vae_models["SWAE"](
        in_channels=3, latent_dim=D, reg_weight=100, wasserstein_deg=2.0,
        num_projections=S, projection_dist="normal").loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "z": jnp.asarray(z)}, prior_z=jnp.asarray(prior),
        proj=jnp.asarray(unit_proj))
    _close(r["loss"], ours["loss"])
    _close(r["SWD"], ours["SWD"])


def test_factorvae_two_phase_parity(ref_mods):
    """Pin the discriminator outputs; verify both optimizer phases'
    formulas and the D_z_reserve protocol against the reference."""
    import jax.numpy as jnp
    from ctvae_tpu.models import vae_models

    B, D = 8, 6
    rng = np.random.default_rng(4)
    x, rec = _imgs((B, 16, 16, 3), 4), _imgs((B, 16, 16, 3), 5)
    mu = rng.normal(size=(B, D)).astype(np.float32)
    lv = (rng.normal(size=(B, D)) * 0.3).astype(np.float32)
    z = rng.normal(size=(B, D)).astype(np.float32)
    d_z = rng.normal(size=(B, 2)).astype(np.float32)
    d_perm = rng.normal(size=(B, 2)).astype(np.float32)

    ref = ref_mods["fvae"].FactorVAE(3, D, gamma=6.4)

    class PinnedD(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.outs = iter([torch.from_numpy(d_z), torch.from_numpy(d_perm)])

        def forward(self, t):
            return next(self.outs)

    ref.discriminator = PinnedD()
    r0 = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(mu),
                           torch.from_numpy(lv), torch.from_numpy(z),
                           M_N=0.005, optimizer_idx=0)
    r1 = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(mu),
                           torch.from_numpy(lv), torch.from_numpy(z),
                           M_N=0.005, optimizer_idx=1)

    model = vae_models["FactorVAE"](in_channels=3, latent_dim=D, gamma=6.4)
    outputs = {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
               "mu": jnp.asarray(mu), "log_var": jnp.asarray(lv),
               "z": jnp.asarray(z), "D_z": jnp.asarray(d_z),
               "D_z_sg": jnp.asarray(d_z), "D_z_perm": jnp.asarray(d_perm)}
    o0 = model.loss_function(outputs, M_N=0.005, optimizer_idx=0)
    o1 = model.loss_function(outputs, M_N=0.005, optimizer_idx=1)
    _close(r0["loss"], o0["loss"])
    _close(r0["VAE_TC_Loss"], o0["VAE_TC_Loss"])
    _close(r1["loss"], o1["loss"])
    _close(r1["D_TC_Loss"], o1["D_TC_Loss"])


def test_hvae_loss_parity(ref_mods_hier):
    """HVAE two-level KL combination, with the reference's learned
    z2->z1 prior heads pinned to fixed outputs on both sides."""
    import jax.numpy as jnp
    from ctvae_tpu.models import vae_models

    B, D1, D2 = 6, 5, 4
    rng = np.random.default_rng(6)
    x, rec = _imgs((B, 16, 16, 3), 6), _imgs((B, 16, 16, 3), 7)
    z1_mu = rng.normal(size=(B, D1)).astype(np.float32)
    z1_lv = (rng.normal(size=(B, D1)) * 0.3).astype(np.float32)
    z2_mu = rng.normal(size=(B, D2)).astype(np.float32)
    z2_lv = (rng.normal(size=(B, D2)) * 0.3).astype(np.float32)
    z1 = rng.normal(size=(B, D1)).astype(np.float32)
    z2 = rng.normal(size=(B, D2)).astype(np.float32)
    z1_p_mu = rng.normal(size=(B, D1)).astype(np.float32)
    z1_p_lv = (rng.normal(size=(B, D1)) * 0.3).astype(np.float32)

    ref = ref_mods_hier["hvae"].HVAE(3, latent1_dim=D1, latent2_dim=D2)

    class Pinned(torch.nn.Module):
        def __init__(self, value):
            super().__init__()
            self.value = torch.from_numpy(value)

        def forward(self, t):
            return self.value

    ref.recons_z1_mu = Pinned(z1_p_mu)
    ref.recons_z1_log_var = Pinned(z1_p_lv)
    r = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(z1_mu),
                          torch.from_numpy(z1_lv), torch.from_numpy(z2_mu),
                          torch.from_numpy(z2_lv), torch.from_numpy(z1),
                          torch.from_numpy(z2), M_N=0.005)

    ours = vae_models["HVAE"](in_channels=3, latent1_dim=D1,
                              latent2_dim=D2).loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "z1_mu": jnp.asarray(z1_mu), "z1_log_var": jnp.asarray(z1_lv),
         "z2_mu": jnp.asarray(z2_mu), "z2_log_var": jnp.asarray(z2_lv),
         "z1": jnp.asarray(z1), "z1_p_mu": jnp.asarray(z1_p_mu),
         "z1_p_log_var": jnp.asarray(z1_p_lv)}, M_N=0.005)
    _close(r["loss"], ours["loss"])
    _close(r["KLD"], ours["KLD"])


def test_vampvae_loss_parity(ref_mods_hier):
    """VampPrior mixture KL with the pseudo-input encoder pinned to
    fixed prior parameters on both sides (.cuda() stubbed to identity)."""
    import jax.numpy as jnp
    from ctvae_tpu.models import vae_models

    B, D, K = 6, 5, 7
    rng = np.random.default_rng(8)
    x, rec = _imgs((B, 16, 16, 3), 8), _imgs((B, 16, 16, 3), 9)
    mu = rng.normal(size=(B, D)).astype(np.float32)
    lv = (rng.normal(size=(B, D)) * 0.3).astype(np.float32)
    z = rng.normal(size=(B, D)).astype(np.float32)
    prior_mu = rng.normal(size=(K, D)).astype(np.float32)
    prior_lv = (rng.normal(size=(K, D)) * 0.3).astype(np.float32)

    ref = ref_mods_hier["vampvae"].VampVAE(3, D, num_components=K)
    ref.encode = lambda t: (torch.from_numpy(prior_mu),
                            torch.from_numpy(prior_lv))
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self   # loss calls .cuda()
    try:
        r = ref.loss_function(_nchw(rec), _nchw(x), torch.from_numpy(mu),
                              torch.from_numpy(lv), torch.from_numpy(z),
                              M_N=0.005)
    finally:
        torch.Tensor.cuda = orig_cuda

    ours = vae_models["VampVAE"](in_channels=3, latent_dim=D,
                                 num_components=K).loss_function(
        {"recons": jnp.asarray(rec), "input": jnp.asarray(x),
         "mu": jnp.asarray(mu), "log_var": jnp.asarray(lv),
         "z": jnp.asarray(z), "prior_mu": jnp.asarray(prior_mu),
         "prior_log_var": jnp.asarray(prior_lv)}, M_N=0.005)
    _close(r["loss"], ours["loss"])
    _close(r["KLD"], ours["KLD"])


@pytest.fixture(scope="module")
def ref_mods_hier(ref_mods):
    import importlib
    return {"hvae": importlib.import_module("models.hvae"),
            "vampvae": importlib.import_module("models.vampvae")}
