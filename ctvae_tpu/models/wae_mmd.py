"""WAE-MMD — Wasserstein autoencoder with MMD penalty; deterministic
encoder (no reparameterization).

Parity target: /root/reference/models/wae_mmd.py:103-204 (the
``reg_weight / (N(N-1))`` bias correction multiplies every kernel term).
"""

from __future__ import annotations

from typing import Dict

from .base import Array, ModelOutput, mse_loss
from .gaussian_base import StandardGaussianVAE
from .mmd import compute_mmd


class WAE_MMD(StandardGaussianVAE):
    reg_weight: float = 100.0
    kernel_type: str = "imq"
    latent_var: float = 2.0
    deterministic: bool = True

    def loss_function(self, outputs: ModelOutput, *, rng: Array = None,
                      prior_z: Array = None, **kwargs) -> Dict[str, Array]:
        z = outputs["z"]
        batch_size = z.shape[0]
        reg = self.reg_weight / (batch_size * (batch_size - 1))
        recons_loss = mse_loss(outputs["recons"], outputs["input"])
        mmd = reg * compute_mmd(rng, z, self.kernel_type, self.latent_var,
                                prior_z=prior_z)
        loss = recons_loss + mmd
        return {"loss": loss, "Reconstruction_Loss": recons_loss, "MMD": mmd}
