"""BetaTCVAE — total-correlation decomposition via minibatch importance
weighting.

Parity target: /root/reference/models/betatc_vae.py. Distinct backbone:
k4-s2 convs (no BatchNorm), ``hidden_dims=[32,32,32,32]``, fc(256)
bottleneck (:30-82). The loss (:144-211) splits the KL into MI / TC / KLD
with the reference's exact importance-weight matrix (fill ``1/(B-1)``,
column 0 = ``1/N``, column 1 = strat weight, ``[B-2,0]`` = strat weight,
``N = B / M_N``); the ``num_iter`` annealing counter is the ``step`` input.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .backbones import leaky_relu
from .base import (Array, BaseVAE, ModelOutput, reparameterize, upcast32)


def log_density_gaussian(x: Array, mu: Array, log_var: Array) -> Array:
    norm = -0.5 * (math.log(2 * math.pi) + log_var)
    return norm - 0.5 * jnp.square(x - mu) * jnp.exp(-log_var)


class BetaTCVAE(BaseVAE):
    in_channels: int = 3
    latent_dim: int = 10
    hidden_dims: Optional[Sequence[int]] = None
    anneal_steps: int = 200
    alpha: float = 1.0
    beta: float = 6.0
    gamma: float = 1.0
    img_size: int = 64
    dtype: jnp.dtype = jnp.float32

    @property
    def _hdims(self):
        return tuple(self.hidden_dims) if self.hidden_dims else (32, 32, 32, 32)

    @property
    def _feat_hw(self) -> int:
        return self.img_size // (2 ** len(self._hdims))

    def setup(self):
        # All submodules live in setup() (not @nn.compact) so that
        # decode/sample/generate can run outside __call__ — the training
        # CLI's sample_images drives model.sample directly. Index-based
        # names: the reference default hidden_dims=[32,32,32,32] repeats
        # widths, so width-based names would collide.
        hd = self._hdims
        self.enc_convs = [
            nn.Conv(h, (4, 4), strides=(2, 2), padding="SAME",
                    dtype=self.dtype) for h in hd]
        self.fc = nn.Dense(256, dtype=self.dtype)
        self.fc_mu = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.fc_var = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.decoder_input = nn.Dense(hd[-1] * self._feat_hw * self._feat_hw,
                                      dtype=self.dtype)
        self.dec_convs = [
            nn.ConvTranspose(h, (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)),
                             dtype=self.dtype) for h in list(hd)[::-1][1:]]
        self.dec_final_up = nn.ConvTranspose(hd[0], (3, 3), strides=(2, 2),
                                             padding=((1, 2), (1, 2)),
                                             dtype=self.dtype)
        self.dec_final_conv = nn.Conv(self.in_channels, (3, 3),
                                      padding="SAME", dtype=self.dtype)

    def __call__(self, x: Array, *, train: bool = False, **kwargs) -> ModelOutput:
        mu, log_var = self._encode(x)
        if train:
            z = reparameterize(self.make_rng("reparam"), mu, log_var)
        else:
            z = mu
        recons = self._decode(z)
        return {"recons": recons, "input": x, "mu": mu, "log_var": log_var,
                "z": z}

    def _encode(self, x: Array):
        for conv in self.enc_convs:
            x = leaky_relu(conv(x))
        x = x.reshape(x.shape[0], -1)
        x = self.fc(x)
        mu = self.fc_mu(x)
        lv = self.fc_var(x)
        return upcast32(mu), upcast32(lv)

    def _decode(self, z: Array) -> Array:
        hd = list(self._hdims)
        hw = self._feat_hw
        x = self.decoder_input(z)
        x = x.reshape(z.shape[0], hw, hw, hd[-1])
        for conv in self.dec_convs:
            x = leaky_relu(conv(x))
        x = leaky_relu(self.dec_final_up(x))
        x = self.dec_final_conv(x)
        return upcast32(jnp.tanh(x))

    def encode(self, x: Array, *, train: bool = False):
        return list(self._encode(x))

    def decode(self, z: Array, *, train: bool = False) -> Array:
        return self._decode(z)

    def sample(self, num_samples: int, *, train: bool = False) -> Array:
        z = jax.random.normal(self.make_rng("reparam"),
                              (num_samples, self.latent_dim))
        return self._decode(z)

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      step: Array = 0, train: bool = True,
                      **kwargs) -> Dict[str, Array]:
        recons, x = outputs["recons"], outputs["input"]
        mu, log_var, z = outputs["mu"], outputs["log_var"], outputs["z"]
        B, D = z.shape

        recons_loss = jnp.sum(jnp.square(recons - x))  # reduction='sum'

        log_q_zx = jnp.sum(log_density_gaussian(z, mu, log_var), axis=1)
        log_p_z = jnp.sum(log_density_gaussian(z, jnp.zeros_like(z),
                                               jnp.zeros_like(z)), axis=1)
        mat_log_q_z = log_density_gaussian(z[:, None, :], mu[None, :, :],
                                           log_var[None, :, :])  # [B,B,D]

        dataset_size = (1.0 / M_N) * B
        strat_weight = (dataset_size - B + 1) / (dataset_size * (B - 1))
        iw = jnp.full((B, B), 1.0 / (B - 1))
        iw = iw.at[:, 0].set(1.0 / dataset_size)
        iw = iw.at[:, 1].set(strat_weight)
        iw = iw.at[B - 2, 0].set(strat_weight)
        mat_log_q_z = mat_log_q_z + jnp.log(iw)[:, :, None]

        log_q_z = jax.scipy.special.logsumexp(jnp.sum(mat_log_q_z, axis=2),
                                              axis=1)
        log_prod_q_z = jnp.sum(
            jax.scipy.special.logsumexp(mat_log_q_z, axis=1), axis=1)

        mi_loss = jnp.mean(log_q_zx - log_q_z)
        tc_loss = jnp.mean(log_q_z - log_prod_q_z)
        kld_loss = jnp.mean(log_prod_q_z - log_p_z)

        if train:
            anneal_rate = jnp.minimum(
                (jnp.asarray(step, jnp.float32) + 1.0) / self.anneal_steps, 1.0)
        else:
            anneal_rate = 1.0

        loss = (recons_loss / B + self.alpha * mi_loss
                + self.beta * tc_loss + anneal_rate * self.gamma * kld_loss)
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "KLD": kld_loss, "TC_Loss": tc_loss, "MI_Loss": mi_loss}
