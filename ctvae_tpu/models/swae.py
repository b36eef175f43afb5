"""SWAE — Sliced-Wasserstein autoencoder; deterministic encoder, sort-based
1-D Wasserstein distance over random projections.

Parity target: /root/reference/models/swae.py:110-179.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .base import (Array, ModelOutput, mse_loss, upcast32)
from .gaussian_base import StandardGaussianVAE


class SWAE(StandardGaussianVAE):
    reg_weight: float = 100.0
    wasserstein_deg: float = 2.0
    num_projections: int = 50
    projection_dist: str = "normal"
    deterministic: bool = True

    def _random_projections(self, rng: Array) -> Array:
        shape = (self.num_projections, self.latent_dim)
        if self.projection_dist == "normal":
            samples = jax.random.normal(rng, shape)
        elif self.projection_dist == "cauchy":
            samples = jax.random.cauchy(rng, shape)
        else:
            raise ValueError("Unknown projection distribution.")
        return samples / jnp.linalg.norm(samples, axis=1, keepdims=True)

    def compute_swd(self, rng: Array, z: Array, prior_z: Array = None,
                    proj: Array = None) -> Array:
        """``prior_z`` / ``proj`` pin the random draws (parity tests)."""
        z = upcast32(z)
        batch_size = z.shape[0]
        reg = self.reg_weight / (batch_size * (batch_size - 1))
        rng_prior, rng_proj = jax.random.split(rng) if rng is not None \
            else (None, None)
        if prior_z is None:
            prior_z = jax.random.normal(rng_prior, z.shape)
        if proj is None:
            proj = self._random_projections(rng_proj)
        proj = proj.T                                               # [D, S]
        latent_proj = z @ proj                                      # [N, S]
        prior_proj = prior_z @ proj
        w_dist = (jnp.sort(latent_proj.T, axis=1)
                  - jnp.sort(prior_proj.T, axis=1))
        return reg * jnp.mean(jnp.power(w_dist, self.wasserstein_deg))

    def loss_function(self, outputs: ModelOutput, *, rng: Array = None,
                      prior_z: Array = None, proj: Array = None,
                      **kwargs) -> Dict[str, Array]:
        recons, x, z = outputs["recons"], outputs["input"], outputs["z"]
        l2 = mse_loss(recons, x)
        l1 = jnp.mean(jnp.abs(recons - x))
        swd = self.compute_swd(rng, z, prior_z=prior_z, proj=proj)
        loss = l2 + l1 + swd
        return {"loss": loss, "Reconstruction_Loss": l2 + l1, "SWD": swd}
