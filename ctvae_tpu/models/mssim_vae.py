"""MSSIMVAE — reconstruction loss = 1 - MS-SSIM over 5 scales.

Parity target: /root/reference/models/mssim_vae.py:126-153 (+ the MSSIM
module :182-280, implemented in ``ctvae_tpu.ops.ssim``).
"""

from __future__ import annotations

from typing import Dict

from ..ops.ssim import mssim_loss
from .base import Array, ModelOutput, gaussian_kl
from .gaussian_base import StandardGaussianVAE


class MSSIMVAE(StandardGaussianVAE):
    window_size: int = 11
    size_average: bool = True
    # quirk-exact knobs (see ops/ssim.py): the reference's inverted
    # window and its (commented-out) normalize stabilization
    window_mode: str = "gaussian"  # "gaussian" | "reference"
    normalize: bool = True

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        recons_loss = mssim_loss(outputs["recons"], outputs["input"],
                                 window_size=self.window_size,
                                 normalize=self.normalize,
                                 window_mode=self.window_mode)
        kld = gaussian_kl(outputs["mu"], outputs["log_var"])
        loss = recons_loss + M_N * kld
        return {"loss": loss, "Reconstruction_Loss": recons_loss, "KLD": -kld}
