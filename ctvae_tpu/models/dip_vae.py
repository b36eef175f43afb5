"""DIPVAE — Disentangled Inferred Prior VAE (DIP-VAE-II covariance penalty).

Parity target: /root/reference/models/dip_vae.py:126-165 (sum-reduced
recon + KL, off-diagonal/diagonal covariance penalties on mu).

Deviation, by design: the reference's expected-covariance term
``torch.mean(torch.diagonal((2*log_var).exp(), dim1=0), dim=0)``
(:152) collapses E[Sigma] to a *scalar* (the mean of an arbitrary
[B,D]-matrix diagonal). We implement the paper-correct DIP-VAE-II term —
``cov_z = cov_mu + diag(E_b[exp(log_var)])`` — added on the diagonal.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .base import (Array, ModelOutput, upcast32)
from .gaussian_base import StandardGaussianVAE


class DIPVAE(StandardGaussianVAE):
    lambda_diag: float = 10.0
    lambda_offdiag: float = 5.0

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
        expected_var = jnp.mean(jnp.exp(log_var), axis=0)            # [D]
        cov_z = cov_mu + jnp.diag(expected_var)

        cov_diag = jnp.diag(cov_z)
        cov_offdiag = cov_z - jnp.diag(cov_diag)
        dip_loss = (self.lambda_offdiag * jnp.sum(jnp.square(cov_offdiag))
                    + self.lambda_diag * jnp.sum(jnp.square(cov_diag - 1.0)))

        loss = recons_loss + M_N * kld + dip_loss
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "KLD": -kld, "DIP_Loss": dip_loss}
