"""GammaVAE — Gamma-distributed latent via the shape-augmentation
reparameterization trick.

Parity target: /root/reference/models/gamma_vae.py:116-212 — Softmax
heads for (alpha, beta) (:43-46), h/inv_h reparameterization (:137-156),
Gamma-Gamma KL via the I-function (:168-182), orthogonal weight init
(:239-247). Per the reference, the loss dict carries only ``loss``
(:212); we additionally log ``Reconstruction_Loss`` so top-k
checkpointing on it works.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.scipy.special import digamma, gammaln

from .backbones import (ConvDecoder, ConvEncoder, DecoderInput,
                        DEFAULT_HIDDEN_DIMS)
from .base import (Array, BaseVAE, ModelOutput, upcast32)


class GammaVAE(BaseVAE):
    in_channels: int = 3
    latent_dim: int = 128
    hidden_dims: Optional[Sequence[int]] = None
    gamma_shape: float = 8.0
    prior_shape: float = 2.0
    prior_rate: float = 1.0
    img_size: int = 64
    dtype: jnp.dtype = jnp.float32

    @property
    def _hdims(self):
        return tuple(self.hidden_dims) if self.hidden_dims else DEFAULT_HIDDEN_DIMS

    @property
    def _feat_hw(self) -> int:
        return self.img_size // (2 ** len(self._hdims))

    def setup(self):
        hd = self._hdims
        self.encoder = ConvEncoder(hd, dtype=self.dtype)
        ortho = nn.initializers.orthogonal()
        self.fc_mu = nn.Dense(self.latent_dim, kernel_init=ortho,
                              dtype=self.dtype)
        self.fc_var = nn.Dense(self.latent_dim, kernel_init=ortho,
                               dtype=self.dtype)
        self.decoder_input = DecoderInput(hd[-1], spatial=self._feat_hw,
                                          dtype=self.dtype)
        # The reference's final layer ends in Sigmoid, not the zoo's
        # usual Tanh (/root/reference/models/gamma_vae.py:69-80)
        self.decoder = ConvDecoder(hd, out_channels=self.in_channels,
                                   final_activation="sigmoid",
                                   dtype=self.dtype)

    def encode(self, x: Array, *, train: bool = False):
        feat = self.encoder(x, train=train)
        flat = feat.reshape(feat.shape[0], -1)
        alpha = jax.nn.softmax(upcast32(self.fc_mu(flat)), axis=-1)
        beta = jax.nn.softmax(upcast32(self.fc_var(flat)), axis=-1)
        return [alpha, beta]

    def decode(self, z: Array, *, train: bool = False) -> Array:
        return self.decoder(self.decoder_input(z), train=train)

    @staticmethod
    def h_func(alpha: Array, eps: Array) -> Array:
        return (alpha - 1.0 / 3.0) * (1 + eps / jnp.sqrt(9.0 * alpha - 3.0)) ** 3

    @staticmethod
    def inv_h_func(alpha: Array, z: Array) -> Array:
        return jnp.sqrt(9.0 * alpha - 3.0) * (
            (z / (alpha - 1.0 / 3.0)) ** (1.0 / 3.0) - 1.0)

    def reparameterize(self, rng: Array, alpha: Array, beta: Array) -> Array:
        a_sg = jax.lax.stop_gradient(alpha)
        # z_hat ~ Gamma(alpha + B, 1), sampled without gradient
        z_hat = jax.lax.stop_gradient(
            jax.random.gamma(rng, a_sg + self.gamma_shape))
        eps = self.inv_h_func(alpha + self.gamma_shape, z_hat)
        z = self.h_func(alpha + self.gamma_shape, eps)
        return z / beta

    def __call__(self, x: Array, *, train: bool = False, **kwargs) -> ModelOutput:
        alpha, beta = self.encode(x, train=train)
        z = self.reparameterize(self.make_rng("reparam"), alpha, beta)
        return {"recons": self.decode(z, train=train), "input": x,
                "alpha": alpha, "beta": beta}

    def sample(self, num_samples: int, *, train: bool = False) -> Array:
        rng = self.make_rng("reparam")
        z = jax.random.gamma(rng, self.prior_shape,
                             (num_samples, self.latent_dim)) / self.prior_rate
        return self.decode(z, train=train)

    @staticmethod
    def _I_function(a, b, c, d):
        return (-c * d / a - b * jnp.log(a) - gammaln(b)
                + (b - 1) * (digamma(d) + jnp.log(c)))

    def _gamma_kl(self, a, b, c, d):
        a = 1.0 / a
        c = 1.0 / c
        losses = self._I_function(c, d, c, d) - self._I_function(a, b, c, d)
        return jnp.sum(losses, axis=1)

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        recons, x = outputs["recons"], outputs["input"]
        alpha, beta = outputs["alpha"], outputs["beta"]
        recons_per_ex = jnp.mean(jnp.square(recons - x), axis=(1, 2, 3))
        prior_alpha = jnp.full((1,), self.prior_shape)
        prior_beta = jnp.full((1,), self.prior_rate)
        kld = self._gamma_kl(alpha, beta, prior_alpha, prior_beta)
        loss = jnp.mean(recons_per_ex + kld)
        return {"loss": loss, "Reconstruction_Loss": jnp.mean(recons_per_ex)}
