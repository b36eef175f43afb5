"""DIPVAE — Disentangled Inferred Prior VAE (DIP-VAE-II covariance penalty).

Parity target: /root/reference/models/dip_vae.py:126-165 (sum-reduced
recon + KL, off-diagonal/diagonal covariance penalties on mu).

Deviation, by design: the reference's expected-covariance term
``torch.mean(torch.diagonal((2*log_var).exp(), dim1=0), dim=0)``
(:152) collapses E[Sigma] to a *scalar* (the mean of an arbitrary
[B,D]-matrix diagonal). We implement the paper-correct DIP-VAE-II term —
``cov_z = cov_mu + diag(E_b[exp(log_var)])`` — added on the diagonal.
``variance_term="reference"`` reproduces the reference exactly (the
scalar ``mean(diag(exp(2*log_var)))`` added to EVERY entry of cov_mu)
for drop-in numerical compatibility, same spirit as MCQ's
``slicing="overlap"`` quirk flag.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .base import (Array, ModelOutput, upcast32)
from .gaussian_base import StandardGaussianVAE


class DIPVAE(StandardGaussianVAE):
    lambda_diag: float = 10.0
    lambda_offdiag: float = 5.0
    variance_term: str = "paper"  # "paper" | "reference" (quirk-exact)

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        recons, x = outputs["recons"], outputs["input"]
        mu = upcast32(outputs["mu"])
        log_var = upcast32(outputs["log_var"])

        recons_loss = jnp.sum(jnp.square(recons - x))  # reduction='sum'
        kld = jnp.sum(-0.5 * jnp.sum(
            1 + log_var - jnp.square(mu) - jnp.exp(log_var), axis=1))

        centered = mu - jnp.mean(mu, axis=1, keepdims=True)
        cov_mu = centered.T @ centered                              # [D, D]
        if self.variance_term == "reference":
            # reference dip_vae.py:152 — diagonal of the [B, D] matrix
            # exp(2*log_var) (length min(B, D)), mean-collapsed to a
            # scalar and broadcast onto every entry of cov_mu
            b, d = log_var.shape
            diag_len = min(b, d)
            scalar = jnp.mean(jnp.exp(2.0 * log_var)[
                jnp.arange(diag_len), jnp.arange(diag_len)])
            cov_z = cov_mu + scalar
        else:
            expected_var = jnp.mean(jnp.exp(log_var), axis=0)        # [D]
            cov_z = cov_mu + jnp.diag(expected_var)

        cov_diag = jnp.diag(cov_z)
        cov_offdiag = cov_z - jnp.diag(cov_diag)
        dip_loss = (self.lambda_offdiag * jnp.sum(jnp.square(cov_offdiag))
                    + self.lambda_diag * jnp.sum(jnp.square(cov_diag - 1.0)))

        loss = recons_loss + M_N * kld + dip_loss
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "KLD": -kld, "DIP_Loss": dip_loss}
