"""LogCoshVAE — numerically-stable log-cosh reconstruction loss.

Parity target: /root/reference/models/logcosh_vae.py:125-155.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .base import (Array, ModelOutput, gaussian_kl, upcast32)
from .gaussian_base import StandardGaussianVAE


class LogCoshVAE(StandardGaussianVAE):
    alpha: float = 100.0
    beta: float = 10.0

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        t = upcast32((outputs["recons"] - outputs["input"]))
        # log(cosh(a*t)) = |a*t| + log(1 + exp(-2|a*t|)) - log(2).
        # The reference writes this without the |.| (logcosh_vae.py:146-148),
        # which overflows to inf for a*t << 0; log-cosh is even, so the
        # absolute-value form is the same function, stable on both sides.
        at = jnp.abs(self.alpha * t)
        rl = at + jnp.log1p(jnp.exp(-2.0 * at)) - jnp.log(2.0)
        recons_loss = jnp.mean(rl) / self.alpha
        kld = gaussian_kl(outputs["mu"], outputs["log_var"])
        loss = recons_loss + self.beta * M_N * kld
        return {"loss": loss, "Reconstruction_Loss": recons_loss, "KLD": -kld}
