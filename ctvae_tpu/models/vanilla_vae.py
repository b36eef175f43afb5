"""VanillaVAE — Gaussian VAE with MSE reconstruction + KL.

Parity target: /root/reference/models/vanilla_vae.py (loss at :139-146).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .backbones import (ConvDecoder, ConvEncoder, DecoderInput,
                        DEFAULT_HIDDEN_DIMS, GaussianHead)
from .base import Array, BaseVAE, ModelOutput, gaussian_kl, mse_loss, reparameterize


class VanillaVAE(BaseVAE):
    in_channels: int = 3
    latent_dim: int = 128
    hidden_dims: Optional[Sequence[int]] = None
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
        self.head = GaussianHead(self.latent_dim, dtype=self.dtype)
        self.decoder_input = DecoderInput(hd[-1], spatial=self._feat_hw,
                                          dtype=self.dtype)
        self.decoder = ConvDecoder(hd, out_channels=self.in_channels,
                                   dtype=self.dtype)

    def encode(self, x: Array, *, train: bool = False):
        feat = self.encoder(x, train=train)
        mu, log_var = self.head(feat)
        return [mu, log_var]

    def decode(self, z: Array, *, train: bool = False) -> Array:
        return self.decoder(self.decoder_input(z), train=train)

    def __call__(self, x: Array, *, train: bool = False, **kwargs) -> ModelOutput:
        mu, log_var = self.encode(x, train=train)
        if train:
            z = reparameterize(self.make_rng("reparam"), mu, log_var)
        else:
            z = mu  # deterministic eval
        recons = self.decode(z, train=train)
        return {"recons": recons, "input": x, "mu": mu, "log_var": log_var, "z": z}

    def sample(self, num_samples: int, *, train: bool = False) -> Array:
        z = jax.random.normal(self.make_rng("reparam"),
                              (num_samples, self.latent_dim))
        return self.decode(z, train=train)

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        recons_loss = mse_loss(outputs["recons"], outputs["input"])
        kld = gaussian_kl(outputs["mu"], outputs["log_var"])
        loss = recons_loss + M_N * kld
        return {"loss": loss, "Reconstruction_Loss": recons_loss, "KLD": -kld}
