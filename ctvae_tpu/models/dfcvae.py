"""DFCVAE — deep-feature-consistent VAE; MSE in frozen VGG19-bn feature
space at layers {'14','24','34','43'}.

Parity target: /root/reference/models/dfcvae.py:132-190.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from .base import Array, ModelOutput, gaussian_kl, mse_loss
from .gaussian_base import StandardGaussianVAE
from .vgg import FrozenVGG19BN


class DFCVAE(StandardGaussianVAE):
    alpha: float = 1.0
    beta: float = 0.5
    # Without local pretrained VGG19-bn weights (CTVAE_VGG19_WEIGHTS),
    # VAEXperiment.setup refuses to train unless this is set — random
    # perceptual features are a different objective than the reference's
    # (/root/reference/models/dfcvae.py:81-87).
    allow_random_features: bool = False

    def setup(self):
        super().setup()
        self.feature_network = FrozenVGG19BN()

    def __call__(self, x: Array, *, train: bool = False, **kwargs) -> ModelOutput:
        out = super().__call__(x, train=train, **kwargs)
        out["recons_features"] = self.feature_network(out["recons"])
        out["input_features"] = self.feature_network(x)
        return out

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        recons_loss = mse_loss(outputs["recons"], outputs["input"])
        feature_loss = jnp.asarray(0.0)
        for r, i in zip(outputs["recons_features"], outputs["input_features"]):
            feature_loss = feature_loss + mse_loss(r, i)
        kld = gaussian_kl(outputs["mu"], outputs["log_var"])
        loss = (self.beta * (recons_loss + feature_loss)
                + self.alpha * M_N * kld)
        return {"loss": loss, "Reconstruction_Loss": recons_loss, "KLD": -kld}
