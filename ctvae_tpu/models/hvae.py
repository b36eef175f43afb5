"""HVAE — two-level hierarchical VAE (z2 -> z1 -> x).

Parity target: /root/reference/models/hvae.py. The prior head
``recons_z1_mu/log_var`` is applied in ``__call__`` (the reference calls
it inside ``loss_function``, :209-210) so the loss stays parameter-free.
The reference's loss key ``'Reconstruction Loss'`` (space, :231) is
normalized to ``Reconstruction_Loss`` so checkpoint monitoring works.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .backbones import ConvDecoder, ConvEncoder, DEFAULT_HIDDEN_DIMS, GaussianHead
from .base import (Array, BaseVAE, ModelOutput, mse_loss, reparameterize, upcast32)


class HVAE(BaseVAE):
    in_channels: int = 3
    latent1_dim: int = 64
    latent2_dim: int = 32
    hidden_dims: Optional[Sequence[int]] = None
    img_size: int = 64
    pseudo_input_size: int = 128
    dtype: jnp.dtype = jnp.float32

    @property
    def _hdims(self):
        return tuple(self.hidden_dims) if self.hidden_dims else DEFAULT_HIDDEN_DIMS

    @property
    def _feat_hw(self) -> int:
        return self.img_size // (2 ** len(self._hdims))

    def setup(self):
        hd = self._hdims
        if hd[-1] % 2:
            raise ValueError(
                f"HVAE: hidden_dims[-1] must be even (got {hd[-1]}): the "
                "decoder feature map's channels are split in half "
                "between the z1 and z2 debed vectors")
        self.encoder_z2_layers = ConvEncoder(hd, dtype=self.dtype)
        self.head_z2 = GaussianHead(self.latent2_dim, dtype=self.dtype)
        self.embed_z2_code = nn.Dense(self.img_size * self.img_size,
                                      dtype=self.dtype)
        self.embed_data = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype)
        self.encoder_z1_layers = ConvEncoder(hd, dtype=self.dtype)
        self.head_z1 = GaussianHead(self.latent1_dim, dtype=self.dtype)
        self.recons_z1_mu = nn.Dense(self.latent1_dim, dtype=self.dtype)
        self.recons_z1_log_var = nn.Dense(self.latent1_dim, dtype=self.dtype)
        half = hd[-1] * self._feat_hw ** 2 // 2
        self.debed_z1_code = nn.Dense(half, dtype=self.dtype)
        self.debed_z2_code = nn.Dense(half, dtype=self.dtype)
        self.decoder = ConvDecoder(hd, out_channels=self.in_channels,
                                   dtype=self.dtype)

    def encode_z2(self, x: Array, *, train: bool):
        return self.head_z2(self.encoder_z2_layers(x, train=train))

    def encode_z1(self, x: Array, z2: Array, *, train: bool):
        emb_x = self.embed_data(x)
        emb_z2 = self.embed_z2_code(z2).reshape(
            -1, self.img_size, self.img_size, 1)
        h = jnp.concatenate([emb_x, emb_z2], axis=-1)
        return self.head_z1(self.encoder_z1_layers(h, train=train))

    def encode(self, x: Array, *, train: bool = False):
        z2_mu, z2_log_var = self.encode_z2(x, train=train)
        z2 = reparameterize(self.make_rng("reparam"), z2_mu, z2_log_var)
        z1_mu, z1_log_var = self.encode_z1(x, z2, train=train)
        return [z1_mu, z1_log_var, z2_mu, z2_log_var, z2]

    def _decode_z1z2(self, z1: Array, z2: Array, *, train: bool) -> Array:
        # The reference concatenates the two debed vectors on dim 1 and
        # views NCHW (hvae.py:183-185): z1 features occupy the FIRST HALF
        # OF THE CHANNELS at every spatial position (not a spatial
        # split), so concat on the channel axis here.
        hw = self._feat_hw
        half_c = self._hdims[-1] // 2
        d1 = self.debed_z1_code(z1).reshape(-1, hw, hw, half_c)
        d2 = self.debed_z2_code(z2).reshape(-1, hw, hw, half_c)
        feat = jnp.concatenate([d1, d2], axis=-1)
        return self.decoder(feat, train=train)

    def __call__(self, x: Array, *, train: bool = False, **kwargs) -> ModelOutput:
        z1_mu, z1_log_var, z2_mu, z2_log_var, z2 = self.encode(x, train=train)
        z1 = reparameterize(self.make_rng("reparam"), z1_mu, z1_log_var)
        recons = self._decode_z1z2(z1, z2, train=train)
        # prior head p(z1|z2) — computed here so the loss is pure arithmetic
        z1_p_mu = upcast32(self.recons_z1_mu(z2))
        z1_p_log_var = upcast32(self.recons_z1_log_var(z2))
        return {"recons": recons, "input": x, "z1_mu": z1_mu,
                "z1_log_var": z1_log_var, "z2_mu": z2_mu,
                "z2_log_var": z2_log_var, "z1": z1, "z2": z2,
                "z1_p_mu": z1_p_mu, "z1_p_log_var": z1_p_log_var}

    def sample(self, num_samples: int, *, train: bool = False) -> Array:
        rng = self.make_rng("reparam")
        rng_z2, rng_z1 = jax.random.split(rng)
        z2 = jax.random.normal(rng_z2, (num_samples, self.latent2_dim))
        z1_mu = upcast32(self.recons_z1_mu(z2))
        z1_log_var = upcast32(self.recons_z1_log_var(z2))
        z1 = reparameterize(rng_z1, z1_mu, z1_log_var)
        return self._decode_z1z2(z1, z2, train=train)

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        recons_loss = mse_loss(outputs["recons"], outputs["input"])
        z1_mu, z1_lv = outputs["z1_mu"], outputs["z1_log_var"]
        z2_mu, z2_lv = outputs["z2_mu"], outputs["z2_log_var"]
        z1 = outputs["z1"]
        z1_p_mu, z1_p_lv = outputs["z1_p_mu"], outputs["z1_p_log_var"]

        def neg_kl(mu, lv):
            return jnp.mean(-0.5 * jnp.sum(
                1 + lv - jnp.square(mu) - jnp.exp(lv), axis=1))

        z1_kld = neg_kl(z1_mu, z1_lv)
        z2_kld = neg_kl(z2_mu, z2_lv)
        z1_p_kld = jnp.mean(-0.5 * jnp.sum(
            1 + z1_p_lv - jnp.square(z1 - z1_p_mu) - jnp.exp(z1_p_lv), axis=1))

        kld_loss = -(z1_p_kld - z1_kld - z2_kld)
        loss = recons_loss + M_N * kld_loss
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "KLD": -kld_loss}
