"""VampVAE — VAE with a VampPrior (mixture over learned pseudo-inputs).

Parity target: /root/reference/models/vampvae.py:118-168, including the
reference's exact (non-standard) Gaussian energy parenthesization
``-0.5 * (log_var + (z - mu)^2) / exp(log_var)`` (:135, :154-155).
The pseudo-input pipeline (identity matrix -> Dense -> Hardtanh[0,1] ->
image, :78-80) generalizes 12288 to ``img_size^2 * in_channels``.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import Array, ModelOutput, mse_loss
from .gaussian_base import StandardGaussianVAE


class VampVAE(StandardGaussianVAE):
    num_components: int = 50

    def setup(self):
        super().setup()
        self.embed_pseudo = nn.Dense(
            self.img_size * self.img_size * self.in_channels,
            dtype=self.dtype, name="embed_pseudo")

    def _pseudo_images(self) -> Array:
        eye = jnp.eye(self.num_components, dtype=jnp.float32)
        x = self.embed_pseudo(eye)
        x = jnp.clip(x, 0.0, 1.0)  # Hardtanh(0, 1)
        return x.reshape(-1, self.img_size, self.img_size, self.in_channels)

    def __call__(self, x: Array, *, train: bool = False, **kwargs) -> ModelOutput:
        out = super().__call__(x, train=train, **kwargs)
        # Encode the pseudo-inputs through the same encoder for the prior
        # mixture (reference does this inside loss_function; here it lives
        # in the forward pass so the loss stays parameter-free).
        prior_mu, prior_log_var = self.encode(self._pseudo_images(),
                                              train=train)
        out["prior_mu"] = prior_mu
        out["prior_log_var"] = prior_log_var
        return out

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        recons_loss = mse_loss(outputs["recons"], outputs["input"])
        mu, log_var, z = outputs["mu"], outputs["log_var"], outputs["z"]
        prior_mu = outputs["prior_mu"][None]            # [1, K, D]
        prior_lv = outputs["prior_log_var"][None]

        E_log_q_z = jnp.mean(jnp.sum(
            -0.5 * (log_var + jnp.square(z - mu)) / jnp.exp(log_var), axis=1))

        z_exp = z[:, None, :]                           # [B, 1, D]
        E_log_p_z = (jnp.sum(
            -0.5 * (prior_lv + jnp.square(z_exp - prior_mu)) / jnp.exp(prior_lv),
            axis=2) - jnp.log(float(self.num_components)))
        E_log_p_z = jnp.mean(jax.scipy.special.logsumexp(E_log_p_z, axis=1))

        kld = -(E_log_p_z - E_log_q_z)
        loss = recons_loss + M_N * kld
        return {"loss": loss, "Reconstruction_Loss": recons_loss, "KLD": -kld}
