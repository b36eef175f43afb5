"""Shared "standard backbone" Gaussian VAE base.

Most of the reference zoo differs only in its loss; the architecture is the
identical stride-2 Conv/BN/LeakyReLU pyramid + fc heads + mirrored decoder
(/root/reference/models/vanilla_vae.py:24-75 and 12 near-copies). This base
factors that out once; subclasses define ``loss_function`` (and may extend
``__call__``'s output dict).

``deterministic`` switches to the WAE/SWAE single-head encoder with no
reparameterization (/root/reference/models/wae_mmd.py:81-94).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .backbones import (ConvDecoder, ConvEncoder, DecoderInput,
                        DEFAULT_HIDDEN_DIMS, GaussianHead)
from .base import (Array, BaseVAE, ModelOutput, reparameterize, upcast32)

import flax.linen as nn


class StandardGaussianVAE(BaseVAE):
    in_channels: int = 3
    latent_dim: int = 128
    hidden_dims: Optional[Sequence[int]] = None
    img_size: int = 64
    deterministic: bool = False
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
        if self.deterministic:
            self.fc_z = nn.Dense(self.latent_dim, dtype=self.dtype)
        else:
            self.head = GaussianHead(self.latent_dim, dtype=self.dtype)
        self.decoder_input = DecoderInput(hd[-1], spatial=self._feat_hw,
                                          dtype=self.dtype)
        self.decoder = ConvDecoder(hd, out_channels=self.in_channels,
                                   dtype=self.dtype)

    def encode(self, x: Array, *, train: bool = False):
        feat = self.encoder(x, train=train)
        if self.deterministic:
            z = upcast32(self.fc_z(feat.reshape(feat.shape[0], -1)))
            return [z]
        mu, log_var = self.head(feat)
        return [mu, log_var]

    def decode(self, z: Array, *, train: bool = False) -> Array:
        return self.decoder(self.decoder_input(z), train=train)

    def __call__(self, x: Array, *, train: bool = False, **kwargs) -> ModelOutput:
        if self.deterministic:
            z = self.encode(x, train=train)[0]
            return {"recons": self.decode(z, train=train), "input": x, "z": z}
        mu, log_var = self.encode(x, train=train)
        if train:
            z = reparameterize(self.make_rng("reparam"), mu, log_var)
        else:
            z = mu
        recons = self.decode(z, train=train)
        return {"recons": recons, "input": x, "mu": mu, "log_var": log_var,
                "z": z}

    def sample(self, num_samples: int, *, train: bool = False) -> Array:
        z = jax.random.normal(self.make_rng("reparam"),
                              (num_samples, self.latent_dim))
        return self.decode(z, train=train)
