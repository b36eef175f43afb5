"""JointVAE — joint continuous + categorical latent with dual capacity
annealing.

Parity target: /root/reference/models/joint_vae.py:111-234. The class-level
``num_iter`` (starts at 1, post-incremented) is ``step + 1`` here.
"""

from __future__ import annotations

import math
from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base import (Array, ModelOutput, gaussian_kl, reparameterize, upcast32)
from .cat_vae import gumbel_softmax_sample
from .gaussian_base import StandardGaussianVAE


class JointVAE(StandardGaussianVAE):
    latent_dim: int = 10
    categorical_dim: int = 10
    latent_min_capacity: float = 0.0
    latent_max_capacity: float = 25.0
    latent_gamma: float = 30.0
    latent_num_iter: int = 25000
    categorical_min_capacity: float = 0.0
    categorical_max_capacity: float = 25.0
    categorical_gamma: float = 30.0
    categorical_num_iter: int = 25000
    temperature: float = 0.5
    anneal_rate: float = 3e-5
    anneal_interval: int = 100
    alpha: float = 30.0

    def setup(self):
        super().setup()
        self.fc_z = nn.Dense(self.categorical_dim, dtype=self.dtype)

    def encode(self, x: Array, *, train: bool = False):
        feat = self.encoder(x, train=train)
        flat = feat.reshape(feat.shape[0], -1)
        mu, log_var = self.head(feat)
        q = upcast32(self.fc_z(flat))
        return [mu, log_var, q]

    def decode(self, z: Array, *, train: bool = False) -> Array:
        return self.decoder(self.decoder_input(z), train=train)

    def __call__(self, x: Array, *, train: bool = False, **kwargs) -> ModelOutput:
        mu, log_var, q = self.encode(x, train=train)
        z = reparameterize(self.make_rng("reparam"), mu, log_var)
        s = gumbel_softmax_sample(self.make_rng("gumbel"), q, self.temperature)
        zs = jnp.concatenate([z, s], axis=1)
        return {"recons": self.decode(zs, train=train), "input": x,
                "q": q, "mu": mu, "log_var": log_var}

    def sample(self, num_samples: int, *, train: bool = False) -> Array:
        rng_z, rng_c = jax.random.split(self.make_rng("reparam"))
        z = jax.random.normal(rng_z, (num_samples, self.latent_dim))
        cats = jax.random.randint(rng_c, (num_samples,), 0,
                                  self.categorical_dim)
        s = jax.nn.one_hot(cats, self.categorical_dim)
        return self.decode(jnp.concatenate([z, s], axis=1), train=train)

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      step: Array = 0, **kwargs) -> Dict[str, Array]:
        recons, x = outputs["recons"], outputs["input"]
        q, mu, log_var = outputs["q"], outputs["mu"], outputs["log_var"]
        num_iter = jnp.asarray(step, jnp.float32) + 1.0

        q_p = jax.nn.softmax(q, axis=-1)
        recons_loss = jnp.mean(jnp.square(recons - x))

        disc_curr = ((self.categorical_max_capacity
                      - self.categorical_min_capacity) * num_iter
                     / self.categorical_num_iter
                     + self.categorical_min_capacity)
        disc_curr = jnp.minimum(disc_curr, math.log(self.categorical_dim))

        eps = 1e-7
        h1 = q_p * jnp.log(q_p + eps)
        h2 = q_p * jnp.log(1.0 / self.categorical_dim + eps)
        kld_disc = jnp.mean(jnp.sum(h1 - h2, axis=1))

        cont_curr = ((self.latent_max_capacity - self.latent_min_capacity)
                     * num_iter / self.latent_num_iter
                     + self.latent_min_capacity)
        cont_curr = jnp.minimum(cont_curr, self.latent_max_capacity)
        kld_cont = gaussian_kl(mu, log_var)

        capacity_loss = (self.categorical_gamma * jnp.abs(disc_curr - kld_disc)
                         + self.latent_gamma * jnp.abs(cont_curr - kld_cont))
        loss = self.alpha * recons_loss + M_N * capacity_loss
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "Capacity_Loss": capacity_loss}
