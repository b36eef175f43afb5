"""VanillaVAE — Gaussian VAE with MSE reconstruction + KL.

Parity target: /root/reference/models/vanilla_vae.py (loss at :139-146).
"""

from __future__ import annotations

from typing import Dict

from .base import Array, ModelOutput, gaussian_kl, mse_loss
from .gaussian_base import StandardGaussianVAE


class VanillaVAE(StandardGaussianVAE):

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        recons_loss = mse_loss(outputs["recons"], outputs["input"])
        kld = gaussian_kl(outputs["mu"], outputs["log_var"])
        loss = recons_loss + M_N * kld
        return {"loss": loss, "Reconstruction_Loss": recons_loss, "KLD": -kld}
