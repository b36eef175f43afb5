"""MIWAE — multiply-importance-weighted autoencoder (M estimates x S
samples).

Parity target: /root/reference/models/miwae.py:124-164 (mean over the M
estimate axis of the per-estimate IWAE objective).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .base import Array, ModelOutput, reparameterize
from .gaussian_base import StandardGaussianVAE


class MIWAE(StandardGaussianVAE):
    num_samples: int = 5
    num_estimates: int = 5

    def __call__(self, x: Array, *, train: bool = False, **kwargs) -> ModelOutput:
        mu, log_var = self.encode(x, train=train)
        M, S = self.num_estimates, self.num_samples
        mu_ms = jnp.broadcast_to(mu[:, None, None, :],
                                 (mu.shape[0], M, S, mu.shape[1]))
        lv_ms = jnp.broadcast_to(log_var[:, None, None, :], mu_ms.shape)
        z = reparameterize(self.make_rng("reparam"), mu_ms, lv_ms)        # [B,M,S,D]
        B, M_, S_, D = z.shape
        recons = self.decode(z.reshape(B * M_ * S_, D), train=train)
        recons = recons.reshape(B, M_, S_, *recons.shape[1:])
        return {"recons": recons, "input": x, "mu": mu_ms, "log_var": lv_ms,
                "z": z}

    def generate(self, x: Array, **kwargs) -> Array:
        return self(x, **kwargs)["recons"][:, 0, 0]

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        recons = outputs["recons"]
        x = outputs["input"][:, None, None]
        mu, log_var = outputs["mu"], outputs["log_var"]

        log_p_x_z = jnp.mean(
            jnp.square(recons - x).reshape(*recons.shape[:3], -1), axis=-1)  # [B,M,S]
        kld = -0.5 * jnp.sum(1 + log_var - jnp.square(mu) - jnp.exp(log_var),
                             axis=3)                                          # [B,M,S]
        log_weight = log_p_x_z + M_N * kld
        weight = jax.nn.softmax(log_weight, axis=-1)
        loss = jnp.mean(jnp.mean(jnp.sum(weight * log_weight, axis=-1), axis=-1))
        return {"loss": loss, "Reconstruction_Loss": jnp.mean(log_p_x_z),
                "KLD": -jnp.mean(kld)}
