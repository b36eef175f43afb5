"""FactorVAE — adversarial total-correlation penalty via a latent
discriminator.

Parity target: /root/reference/models/fvae.py:134-201. The reference's
two-phase loss with the cross-step ``D_z_reserve`` tensor (:175, :197,
requiring ``retain_first_backpass``) is restructured functionally: one
forward computes everything both optimizer phases need —

* ``D_z``      = discriminator on z (grads flow, used by the VAE phase),
* ``D_z_sg``   = discriminator on stop_gradient(z) (discriminator phase),
* ``D_z_perm`` = discriminator on per-sample dim-permuted stop_gradient(z).

Equivalent because the reference's optimizer 1 only updates the
discriminator (``submodel: discriminator``), so gradients it leaks into
the encoder through the reserved tensor are discarded anyway.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import (Array, ModelOutput, gaussian_kl, mse_loss, reparameterize, upcast32)
from .gaussian_base import StandardGaussianVAE


class LatentDiscriminator(nn.Module):
    """3x [Dense(1000) -> BatchNorm -> LeakyReLU(0.2)] -> Dense(2)
    (reference fvae.py:79-88)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array, *, train: bool) -> Array:
        x = z
        for i in range(3):
            x = nn.Dense(1000, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        return upcast32(nn.Dense(2, dtype=self.dtype)(x))


def permute_latent(rng: Array, z: Array) -> Array:
    """Independently permute each latent dimension across nothing — the
    reference permutes the *dims within each sample* (fvae.py:139-149)."""
    B, D = z.shape
    perms = jax.vmap(lambda k: jax.random.permutation(k, D))(
        jax.random.split(rng, B))
    return jnp.take_along_axis(z, perms, axis=1)


class FactorVAE(StandardGaussianVAE):
    gamma: float = 40.0

    def setup(self):
        super().setup()
        self.discriminator = LatentDiscriminator(dtype=self.dtype)

    def __call__(self, x: Array, *, train: bool = False, **kwargs) -> ModelOutput:
        mu, log_var = self.encode(x, train=train)
        if train:
            z = reparameterize(self.make_rng("reparam"), mu, log_var)
        else:
            z = mu
        recons = self.decode(z, train=train)
        D_z = self.discriminator(z, train=train)
        z_sg = jax.lax.stop_gradient(z)
        D_z_sg = self.discriminator(z_sg, train=train)
        z_perm = permute_latent(self.make_rng("noise"), z_sg)
        D_z_perm = self.discriminator(z_perm, train=train)
        return {"recons": recons, "input": x, "mu": mu, "log_var": log_var,
                "z": z, "D_z": D_z, "D_z_sg": D_z_sg, "D_z_perm": D_z_perm}

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      optimizer_idx: int = 0, **kwargs) -> Dict[str, Array]:
        if optimizer_idx == 0:
            recons_loss = mse_loss(outputs["recons"], outputs["input"])
            kld = gaussian_kl(outputs["mu"], outputs["log_var"])
            D_z = outputs["D_z"]
            vae_tc_loss = jnp.mean(D_z[:, 0] - D_z[:, 1])
            loss = recons_loss + M_N * kld + self.gamma * vae_tc_loss
            return {"loss": loss, "Reconstruction_Loss": recons_loss,
                    "KLD": -kld, "VAE_TC_Loss": vae_tc_loss}
        # Discriminator phase: D(z) -> class 0 ("true" latents),
        # D(permuted z) -> class 1 (factorized), reference fvae.py:187-201.
        logp_z = jax.nn.log_softmax(outputs["D_z_sg"], axis=-1)
        logp_perm = jax.nn.log_softmax(outputs["D_z_perm"], axis=-1)
        D_tc_loss = 0.5 * (-jnp.mean(logp_z[:, 0]) - jnp.mean(logp_perm[:, 1]))
        return {"loss": D_tc_loss, "D_TC_Loss": D_tc_loss}
