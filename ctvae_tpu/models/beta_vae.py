"""BetaVAE — beta-weighted KL ('H') or capacity-annealed ('B') objective.

Parity target: /root/reference/models/beta_vae.py:129-152. The reference's
class-level ``num_iter`` counter becomes the explicit ``step`` input, so
the schedule is jit-compatible and restart-exact.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .base import Array, ModelOutput, gaussian_kl, mse_loss
from .gaussian_base import StandardGaussianVAE


class BetaVAE(StandardGaussianVAE):
    beta: float = 4.0
    gamma: float = 1000.0
    max_capacity: float = 25.0
    Capacity_max_iter: float = 1e5
    loss_type: str = "B"

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      step: Array = 0, **kwargs) -> Dict[str, Array]:
        recons_loss = mse_loss(outputs["recons"], outputs["input"])
        kld = gaussian_kl(outputs["mu"], outputs["log_var"])
        if self.loss_type == "H":
            loss = recons_loss + self.beta * M_N * kld
        elif self.loss_type == "B":
            step_f = jnp.asarray(step, jnp.float32) + 1.0  # reference increments first
            C = jnp.clip(self.max_capacity / self.Capacity_max_iter * step_f,
                         0.0, self.max_capacity)
            loss = recons_loss + self.gamma * M_N * jnp.abs(kld - C)
        else:
            raise ValueError("Undefined loss type.")
        return {"loss": loss, "Reconstruction_Loss": recons_loss, "KLD": kld}
