"""InfoVAE — MMD + KLD mixed objective.

Parity target: /root/reference/models/info_vae.py:128-148:
``loss = beta*recon + (1-alpha)*M_N*KL + (alpha+reg_weight-1)/bias_corr * MMD``.
"""

from __future__ import annotations

from typing import Dict


from .base import Array, ModelOutput, gaussian_kl, mse_loss
from .gaussian_base import StandardGaussianVAE
from .mmd import compute_mmd


class InfoVAE(StandardGaussianVAE):
    alpha: float = -0.5
    beta: float = 5.0
    reg_weight: float = 100.0
    kernel_type: str = "imq"
    latent_var: float = 2.0

    def __post_init__(self):
        assert self.alpha <= 0, "alpha must be negative or zero."
        super().__post_init__()

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      rng: Array = None, prior_z: Array = None,
                      **kwargs) -> Dict[str, Array]:
        z = outputs["z"]
        batch_size = z.shape[0]
        bias_corr = batch_size * (batch_size - 1)
        recons_loss = mse_loss(outputs["recons"], outputs["input"])
        mmd = compute_mmd(rng, z, self.kernel_type, self.latent_var,
                          prior_z=prior_z)
        kld = gaussian_kl(outputs["mu"], outputs["log_var"])
        loss = (self.beta * recons_loss
                + (1.0 - self.alpha) * M_N * kld
                + (self.alpha + self.reg_weight - 1.0) / bias_corr * mmd)
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "MMD": mmd, "KLD": -kld}
