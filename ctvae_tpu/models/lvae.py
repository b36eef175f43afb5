"""LVAE — ladder VAE with precision-weighted top-down merges.

Parity target: /root/reference/models/lvae.py: per-rung ``EncoderBlock``
(conv + mu/var heads, :12-41), top-down ``LadderBlock``s (:43-60) with
``merge_gauss`` (:173-184), KL accumulated during decode (:151-171).
"""

from __future__ import annotations

from typing import Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .backbones import leaky_relu
from .base import (Array, BaseVAE, ModelOutput, mse_loss, reparameterize, upcast32)


class EncoderBlock(nn.Module):
    out_channels: int
    latent_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, train: bool):
        h = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)),
                    dtype=self.dtype)(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(h)
        h = leaky_relu(h)
        flat = h.reshape(h.shape[0], -1)
        mu = upcast32(nn.Dense(self.latent_dim, dtype=self.dtype,
                      name="encoder_mu")(flat))
        log_var = upcast32(nn.Dense(self.latent_dim, dtype=self.dtype,
                           name="encoder_var")(flat))
        return h, mu, log_var


class LadderBlock(nn.Module):
    latent_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array, *, train: bool):
        z = nn.Dense(self.latent_dim, dtype=self.dtype)(z)
        z = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(z)
        mu = upcast32(nn.Dense(self.latent_dim, dtype=self.dtype,
                      name="fc_mu")(z))
        log_var = upcast32(nn.Dense(self.latent_dim, dtype=self.dtype,
                           name="fc_var")(z))
        return mu, log_var


def merge_gauss(mu_1, mu_2, log_var_1, log_var_2):
    p_1 = 1.0 / (jnp.exp(log_var_1) + 1e-7)
    p_2 = 1.0 / (jnp.exp(log_var_2) + 1e-7)
    mu = (mu_1 * p_1 + mu_2 * p_2) / (p_1 + p_2)
    log_var = jnp.log(1.0 / (p_1 + p_2))
    return mu, log_var


def kl_divergence(mu_q, log_var_q, mu_p, log_var_p):
    kl = ((log_var_p - log_var_q)
          + (jnp.exp(log_var_q) + jnp.square(mu_q - mu_p))
          / (2 * jnp.exp(log_var_p)) - 0.5)
    return jnp.sum(kl, axis=-1)


class LVAE(BaseVAE):
    in_channels: int = 3
    latent_dims: Sequence[int] = (16, 32, 64)
    hidden_dims: Sequence[int] = (32, 64, 128)
    img_size: int = 64
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert len(self.latent_dims) == len(self.hidden_dims)
        self.encoders = [EncoderBlock(h, l, dtype=self.dtype)
                         for h, l in zip(self.hidden_dims, self.latent_dims)]
        self.ladders = [LadderBlock(self.latent_dims[i - 1], dtype=self.dtype)
                        for i in range(len(self.latent_dims) - 1, 0, -1)]
        feat_hw = self.img_size // (2 ** len(self.hidden_dims))
        self._feat_hw = feat_hw
        self.decoder_input = nn.Dense(
            self.hidden_dims[-1] * feat_hw * feat_hw, dtype=self.dtype)
        self.dec_blocks = [
            (nn.ConvTranspose(h, (3, 3), strides=(2, 2),
                              padding=((1, 2), (1, 2)),
                              dtype=self.dtype),
             nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype))
            for h in list(self.hidden_dims)[::-1][1:]]
        self.final_up = nn.ConvTranspose(self.hidden_dims[0], (3, 3),
                                         strides=(2, 2),
                                         padding=((1, 2), (1, 2)),
                                         dtype=self.dtype)
        self.final_bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype)
        self.final_conv = nn.Conv(self.in_channels, (3, 3), padding="SAME",
                                  dtype=self.dtype)

    def encode(self, x: Array, *, train: bool = False):
        h = x
        post_params = []
        for enc in self.encoders:
            h, mu, log_var = enc(h, train=train)
            post_params.append((mu, log_var))
        return post_params

    def _run_decoder(self, z: Array, *, train: bool) -> Array:
        hw = self._feat_hw
        h = self.decoder_input(z).reshape(-1, hw, hw, self.hidden_dims[-1])
        for conv, bn in self.dec_blocks:
            h = leaky_relu(bn(conv(h), use_running_average=not train))
        h = leaky_relu(self.final_bn(self.final_up(h),
                                     use_running_average=not train))
        return upcast32(jnp.tanh(self.final_conv(h)))

    def __call__(self, x: Array, *, train: bool = False, **kwargs) -> ModelOutput:
        post_params = self.encode(x, train=train)
        mu, log_var = post_params[-1]
        rngs = jax.random.split(self.make_rng("reparam"), len(self.latent_dims))
        z = reparameterize(rngs[0], mu, log_var)
        kl_div = jnp.zeros(x.shape[0])
        below = post_params[:-1][::-1]
        for i, ladder in enumerate(self.ladders):
            mu_e, log_var_e = below[i]
            mu_t, log_var_t = ladder(z, train=train)
            mu_m, log_var_m = merge_gauss(mu_e, mu_t, log_var_e, log_var_t)
            z = reparameterize(rngs[i + 1], mu_m, log_var_m)
            kl_div = kl_div + kl_divergence(mu_m, log_var_m, mu_e, log_var_e)
        recons = self._run_decoder(z, train=train)
        return {"recons": recons, "input": x, "kl_div": kl_div}

    def sample(self, num_samples: int, *, train: bool = False) -> Array:
        rngs = jax.random.split(self.make_rng("reparam"),
                                len(self.latent_dims))
        z = jax.random.normal(rngs[0], (num_samples, self.latent_dims[-1]))
        for i, ladder in enumerate(self.ladders):
            mu, log_var = ladder(z, train=train)
            z = reparameterize(rngs[i + 1], mu, log_var)
        return self._run_decoder(z, train=train)

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        recons_loss = mse_loss(outputs["recons"], outputs["input"])
        kld_loss = jnp.mean(outputs["kl_div"])
        loss = recons_loss + M_N * kld_loss
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "KLD": -kld_loss}
