"""Golden-value tests: each loss_function evaluated on hand-constructed
output dicts and compared against independently-derived closed-form
values (the assertion upgrade over the reference's print-only smoke
tests, SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ctvae_tpu.models import vae_models


def _gauss_outputs(B=4, D=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(B, 8, 8, 3)).astype(np.float32)
    recons = rng.uniform(size=(B, 8, 8, 3)).astype(np.float32)
    mu = rng.normal(size=(B, D)).astype(np.float32)
    log_var = rng.normal(size=(B, D)).astype(np.float32) * 0.3
    return x, recons, mu, log_var


def _np_kl(mu, log_var):
    return np.mean(-0.5 * np.sum(1 + log_var - mu ** 2 - np.exp(log_var),
                                 axis=1))


def test_vanilla_vae_loss_closed_form():
    x, recons, mu, log_var = _gauss_outputs()
    model = vae_models["VanillaVAE"](in_channels=3, latent_dim=3)
    out = {"recons": jnp.asarray(recons), "input": jnp.asarray(x),
           "mu": jnp.asarray(mu), "log_var": jnp.asarray(log_var)}
    losses = model.loss_function(out, M_N=0.05)
    recon = np.mean((recons - x) ** 2)
    kld = _np_kl(mu, log_var)
    np.testing.assert_allclose(float(losses["Reconstruction_Loss"]), recon,
                               rtol=1e-5)
    # KLD is logged negated (reference vanilla_vae.py:146)
    np.testing.assert_allclose(float(losses["KLD"]), -kld, rtol=1e-4)
    np.testing.assert_allclose(float(losses["loss"]), recon + 0.05 * kld,
                               rtol=1e-5)


def test_beta_vae_h_and_b_losses():
    x, recons, mu, log_var = _gauss_outputs(seed=1)
    kld = _np_kl(mu, log_var)
    recon = np.mean((recons - x) ** 2)
    out = {"recons": jnp.asarray(recons), "input": jnp.asarray(x),
           "mu": jnp.asarray(mu), "log_var": jnp.asarray(log_var)}

    mh = vae_models["BetaVAE"](in_channels=3, latent_dim=3, loss_type="H",
                               beta=7.0)
    lh = mh.loss_function(out, M_N=0.01, step=0)
    np.testing.assert_allclose(float(lh["loss"]), recon + 7.0 * 0.01 * kld,
                               rtol=1e-5)

    # capacity annealing: C ramps linearly to max_capacity over
    # Capacity_max_iter steps; the reference increments its counter
    # before use (beta_vae.py:131,139-146), hence the step+1 offset
    mb = vae_models["BetaVAE"](in_channels=3, latent_dim=3, loss_type="B",
                               gamma=10.0, max_capacity=25.0,
                               Capacity_max_iter=100)
    for step, c_expect in [(0, 0.25), (49, 12.5), (99, 25.0), (500, 25.0)]:
        lb = mb.loss_function(out, M_N=0.01, step=step)
        expected = recon + 10.0 * 0.01 * abs(kld - c_expect)
        np.testing.assert_allclose(float(lb["loss"]), expected, rtol=1e-4,
                                   err_msg=f"step={step}")


def test_logcosh_loss_closed_form():
    x, recons, mu, log_var = _gauss_outputs(seed=2)
    alpha, beta = 10.0, 1.0
    model = vae_models["LogCoshVAE"](in_channels=3, latent_dim=3,
                                     alpha=alpha, beta=beta)
    out = {"recons": jnp.asarray(recons), "input": jnp.asarray(x),
           "mu": jnp.asarray(mu), "log_var": jnp.asarray(log_var)}
    losses = model.loss_function(out, M_N=0.01)
    t = recons - x
    # reference logcosh_vae.py:146-150: mean over ALL elements, scaled
    # 1/alpha; KL weighted by beta * M_N
    lc = alpha * t + np.log1p(np.exp(-2 * alpha * t)) - np.log(2.0)
    recon = np.mean(lc) / alpha
    kld = _np_kl(mu, log_var)
    np.testing.assert_allclose(float(losses["Reconstruction_Loss"]), recon,
                               rtol=1e-4)
    np.testing.assert_allclose(float(losses["loss"]),
                               recon + beta * 0.01 * kld, rtol=1e-4)


def test_dip_vae_covariance_penalty():
    x, recons, mu, log_var = _gauss_outputs(seed=3)
    ld, lo = 0.05, 0.1
    model = vae_models["DIPVAE"](in_channels=3, latent_dim=3,
                                 lambda_diag=ld, lambda_offdiag=lo)
    out = {"recons": jnp.asarray(recons), "input": jnp.asarray(x),
           "mu": jnp.asarray(mu), "log_var": jnp.asarray(log_var)}
    losses = model.loss_function(out, M_N=1.0)
    # reference dip_vae.py:149-158 semantics: mu centered along the
    # LATENT axis (dim=1), unnormalized outer product; we add the
    # intended DIP-II variance term diag(E_b[sigma^2]) where the
    # reference's torch.diagonal((2*logvar).exp(), dim1=0) expression
    # degenerates to a scalar (see dip_vae.py docstring here).
    centered = mu - mu.mean(1, keepdims=True)
    cov_mu = centered.T @ centered
    cov_z = cov_mu + np.diag(np.exp(log_var).mean(0))
    diag = np.diag(cov_z)
    off = cov_z - np.diag(diag)
    dip = lo * np.sum(off ** 2) + ld * np.sum((diag - 1) ** 2)
    np.testing.assert_allclose(float(losses["DIP_Loss"]), dip, rtol=1e-4)


def test_iwae_reduces_to_elbo_for_one_sample():
    """With S=1 importance sample the IWAE bound equals the ELBO up to
    the weighting formulation; at minimum the loss must be finite and
    recon part must match plain MSE."""
    model = vae_models["IWAE"](in_channels=3, latent_dim=3, num_samples=1)
    rng = np.random.default_rng(4)
    B, S, D = 4, 1, 3
    x = rng.uniform(size=(B, 8, 8, 3)).astype(np.float32)
    recons = np.repeat(x[:, None], S, 1).astype(np.float32)  # perfect recon
    out = {"recons": jnp.asarray(recons), "input": jnp.asarray(x),
           "mu": jnp.asarray(np.zeros((B, S, D), np.float32)),
           "log_var": jnp.asarray(np.zeros((B, S, D), np.float32)),
           "eps": jnp.asarray(np.zeros((B, S, D), np.float32))}
    losses = model.loss_function(out, M_N=0.005)
    assert np.isfinite(float(losses["loss"]))
    np.testing.assert_allclose(float(losses["Reconstruction_Loss"]), 0.0,
                               atol=1e-6)


def test_categorical_vae_kl_uniform():
    """KL of a uniform categorical posterior vs the uniform prior is 0
    (reference cat_vae.py:166-173)."""
    model = vae_models["CategoricalVAE"](in_channels=3, latent_dim=4,
                                         categorical_dim=5, alpha=1.0)
    B, D, Q = 4, 4, 5
    rng = np.random.default_rng(5)
    x = rng.uniform(size=(B, 8, 8, 3)).astype(np.float32)
    out = {"recons": jnp.asarray(x), "input": jnp.asarray(x),
           "q": jnp.full((B, D, Q), 1.0 / Q, jnp.float32)}
    losses = model.loss_function(out, M_N=0.005, step=0)
    np.testing.assert_allclose(float(losses["KLD"]), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(losses["loss"]), 0.0, atol=1e-5)
