"""IWAE — importance-weighted autoencoder (S samples per input).

Parity target: /root/reference/models/iwae.py:121-160 — the softmax
self-normalized weights multiply the per-sample objective; note the
reference keeps the weights differentiable (the ``.detach()`` is commented
out at :152) and we preserve that.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .base import Array, ModelOutput, reparameterize
from .gaussian_base import StandardGaussianVAE


class IWAE(StandardGaussianVAE):
    num_samples: int = 5

    def __call__(self, x: Array, *, train: bool = False, **kwargs) -> ModelOutput:
        mu, log_var = self.encode(x, train=train)
        mu_s = jnp.repeat(mu[:, None, :], self.num_samples, axis=1)       # [B,S,D]
        lv_s = jnp.repeat(log_var[:, None, :], self.num_samples, axis=1)
        z = reparameterize(self.make_rng("reparam"), mu_s, lv_s)
        B, S, D = z.shape
        recons = self.decode(z.reshape(B * S, D), train=train)
        recons = recons.reshape(B, S, *recons.shape[1:])                  # [B,S,H,W,C]
        return {"recons": recons, "input": x, "mu": mu_s, "log_var": lv_s,
                "z": z}

    def generate(self, x: Array, **kwargs) -> Array:
        return self(x, **kwargs)["recons"][:, 0]

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        recons = outputs["recons"]
        x = outputs["input"][:, None]                                     # [B,1,H,W,C]
        mu, log_var = outputs["mu"], outputs["log_var"]

        log_p_x_z = jnp.mean(
            jnp.square(recons - x).reshape(*recons.shape[:2], -1), axis=-1)  # [B,S]
        kld = -0.5 * jnp.sum(1 + log_var - jnp.square(mu) - jnp.exp(log_var),
                             axis=2)                                       # [B,S]
        log_weight = log_p_x_z + M_N * kld
        weight = jax.nn.softmax(log_weight, axis=-1)
        loss = jnp.mean(jnp.sum(weight * log_weight, axis=-1))
        return {"loss": loss, "Reconstruction_Loss": jnp.mean(log_p_x_z),
                "KLD": -jnp.mean(kld)}
