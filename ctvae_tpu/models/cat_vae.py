"""CategoricalVAE (GumbelVAE) — categorical latent [B, D, Q] with
Gumbel-softmax reparameterization.

Parity target: /root/reference/models/cat_vae.py:118-177. The reference's
temperature "annealing" (:159-161) multiplies by ``exp(-rate*batch_idx)``
but clamps at ``min_temp == temperature``, so the temperature is constant
in practice; we implement the same closed-form schedule functionally.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .base import (Array, ModelOutput, upcast32)
from .gaussian_base import StandardGaussianVAE

import flax.linen as nn


def gumbel_softmax_sample(rng: Array, logits: Array, tau: float,
                          eps: float = 1e-7) -> Array:
    """Soft Gumbel-softmax sample (reference cat_vae.py:124-129 draws
    uniform noise explicitly; we reproduce that construction)."""
    u = jax.random.uniform(rng, logits.shape)
    g = -jnp.log(-jnp.log(u + eps) + eps)
    return jax.nn.softmax((logits + g) / tau, axis=-1)


class CategoricalVAE(StandardGaussianVAE):
    latent_dim: int = 40
    categorical_dim: int = 40
    temperature: float = 0.5
    anneal_rate: float = 3e-5
    anneal_interval: int = 100
    alpha: float = 30.0

    def setup(self):
        hd = self._hdims
        from .backbones import ConvDecoder, ConvEncoder, DecoderInput
        self.encoder = ConvEncoder(hd, dtype=self.dtype)
        self.fc_z = nn.Dense(self.latent_dim * self.categorical_dim,
                             dtype=self.dtype)
        self.decoder_input = DecoderInput(hd[-1], spatial=self._feat_hw,
                                          dtype=self.dtype)
        self.decoder = ConvDecoder(hd, out_channels=self.in_channels,
                                   dtype=self.dtype)

    def _temp(self, step) -> Array:
        # Reference semantics: every `anneal_interval` batches,
        # temp <- max(temp * exp(-rate * batch_idx), min_temp). Because
        # min_temp == temperature the clamp wins immediately; keep the
        # clamp so a future config exposing min_temp stays correct.
        step_f = jnp.asarray(step, jnp.float32)
        last = jnp.floor(step_f / self.anneal_interval) * self.anneal_interval
        return jnp.maximum(self.temperature * jnp.exp(-self.anneal_rate * last),
                           self.temperature)

    def encode(self, x: Array, *, train: bool = False):
        feat = self.encoder(x, train=train)
        z = upcast32(self.fc_z(feat.reshape(feat.shape[0], -1)))
        return [z.reshape(-1, self.latent_dim, self.categorical_dim)]

    def decode(self, z: Array, *, train: bool = False) -> Array:
        return self.decoder(self.decoder_input(z), train=train)

    def __call__(self, x: Array, *, train: bool = False, step=0,
                 **kwargs) -> ModelOutput:
        q = self.encode(x, train=train)[0]
        tau = self._temp(step)
        s = gumbel_softmax_sample(self.make_rng("gumbel"), q, tau)
        s = s.reshape(-1, self.latent_dim * self.categorical_dim)
        return {"recons": self.decode(s, train=train), "input": x, "q": q}

    def sample(self, num_samples: int, *, train: bool = False) -> Array:
        rng = self.make_rng("gumbel")
        cats = jax.random.randint(rng, (num_samples, self.latent_dim), 0,
                                  self.categorical_dim)
        z = jax.nn.one_hot(cats, self.categorical_dim)
        z = z.reshape(num_samples, self.latent_dim * self.categorical_dim)
        return self.decode(z, train=train)

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        recons, x, q = outputs["recons"], outputs["input"], outputs["q"]
        q_p = jax.nn.softmax(q, axis=-1)
        recons_loss = jnp.mean(jnp.square(recons - x))
        eps = 1e-7
        h1 = q_p * jnp.log(q_p + eps)
        h2 = q_p * jnp.log(1.0 / self.categorical_dim + eps)
        kld = jnp.mean(jnp.sum(h1 - h2, axis=(1, 2)))
        loss = self.alpha * recons_loss + M_N * kld
        return {"loss": loss, "Reconstruction_Loss": recons_loss, "KLD": -kld}
