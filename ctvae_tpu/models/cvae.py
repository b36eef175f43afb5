"""ConditionalVAE — class-conditional VAE; the label is embedded as an
extra image channel on encode and concatenated to z on decode.

Parity target: /root/reference/models/cvae.py:119-147.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .backbones import (ConvDecoder, ConvEncoder, DEFAULT_HIDDEN_DIMS,
                        GaussianHead)
from .base import (Array, BaseVAE, ModelOutput, gaussian_kl, mse_loss, reparameterize, upcast32)


class ConditionalVAE(BaseVAE):
    in_channels: int = 3
    num_classes: int = 40
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
        self.embed_class = nn.Dense(self.img_size * self.img_size,
                                    dtype=self.dtype)
        self.embed_data = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype)
        self.encoder = ConvEncoder(hd, dtype=self.dtype)
        self.head = GaussianHead(self.latent_dim, dtype=self.dtype)
        self.decoder_input = nn.Dense(hd[-1] * self._feat_hw ** 2,
                                      dtype=self.dtype)
        self.decoder = ConvDecoder(hd, out_channels=self.in_channels,
                                   dtype=self.dtype)

    def encode(self, x: Array, *, train: bool = False):
        feat = self.encoder(x, train=train)
        mu, log_var = self.head(feat)
        return [mu, log_var]

    def encode_labeled(self, x: Array, labels: Array, *,
                       train: bool = False):
        """Label-conditioned encode from a *raw* image: embed the class
        as an extra image channel (reference cvae.py:119-129), then run
        the standard encoder. This is the entry point serving/metrics use
        — plain ``encode`` expects the already-embedded 4-channel input.
        """
        y = upcast32(labels)
        emb_class = self.embed_class(y).reshape(
            -1, self.img_size, self.img_size, 1)
        xin = jnp.concatenate([self.embed_data(x), emb_class], axis=-1)
        return self.encode(xin, train=train)

    def decode(self, z: Array, *, train: bool = False) -> Array:
        hw = self._feat_hw
        x = self.decoder_input(z).reshape(z.shape[0], hw, hw, self._hdims[-1])
        return self.decoder(x, train=train)

    def __call__(self, x: Array, labels: Array = None, *,
                 train: bool = False, **kwargs) -> ModelOutput:
        y = upcast32(labels)
        mu, log_var = self.encode_labeled(x, y, train=train)
        if train:
            z = reparameterize(self.make_rng("reparam"), mu, log_var)
        else:
            z = mu
        zy = jnp.concatenate([z, y], axis=1)
        return {"recons": self.decode(zy, train=train), "input": x,
                "mu": mu, "log_var": log_var, "z": z}

    def sample(self, num_samples: int, labels: Array = None, *,
               train: bool = False) -> Array:
        y = upcast32(labels)[:num_samples]
        z = jax.random.normal(self.make_rng("reparam"),
                              (num_samples, self.latent_dim))
        return self.decode(jnp.concatenate([z, y], axis=1), train=train)

    def generate(self, x: Array, **kwargs) -> Array:
        return self(x, **kwargs)["recons"]

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        recons_loss = mse_loss(outputs["recons"], outputs["input"])
        kld = gaussian_kl(outputs["mu"], outputs["log_var"])
        loss = recons_loss + M_N * kld
        return {"loss": loss, "Reconstruction_Loss": recons_loss, "KLD": -kld}
