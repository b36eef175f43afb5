"""TwoStageVAE — stage-1 conv VAE + stage-2 latent VAE (Dai & Wipf 2019).

Parity target: /root/reference/models/twostage_vae.py:1-197. Upstream
this model is DISABLED (commented out of the registry,
/root/reference/models/__init__.py:16) and its second stage is
incomplete: ``encoder2/decoder2/fc_mu2/fc_var2`` are constructed
(:75-98) but never called from ``forward``/``loss_function``, and
``decoder2`` lacks the final projection back to ``latent_dim``. We port
the whole surface and FINISH the dormant half:

* ``train_stage=1`` (default): forward/loss are exactly the reference's
  running behavior — a VanillaVAE (loss :148-170). The stage-2 MLPs
  still run (they are cheap, [B, D] dense stacks) so their parameters
  exist in the pytree, matching the reference module tree.
* ``train_stage=2``: the loss becomes the second-stage objective — a
  Gaussian VAE over (stop-gradient) stage-1 latents, the Dai & Wipf
  recipe for repairing the aggregate-posterior/prior mismatch. Pair it
  with ``exp_params.update_parameters`` to freeze the stage-1 backbone
  (the framework's masked-optimizer two-stage recipe).
* ``sample(..., two_stage=True)``: u ~ N(0,I) -> decoder2 -> z ->
  decoder — the two-stage sampling path the paper motivates.

Like the reference, this class is NOT registered in the model registry
(ctvae_tpu/models/__init__.py keeps the same disabled status); import it
explicitly.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

import flax.linen as nn

from .base import (Array, ModelOutput, gaussian_kl, mse_loss,
                   reparameterize, upcast32)
from .gaussian_base import StandardGaussianVAE

DEFAULT_HIDDEN_DIMS2 = (1024, 1024)


class _MLPStack(nn.Module):
    """Dense -> BatchNorm -> LeakyReLU per width (reference :78-98)."""

    widths: Sequence[int]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, train: bool = False) -> Array:
        for w in self.widths:
            x = nn.Dense(w, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(x)
            x = nn.leaky_relu(x, negative_slope=0.01)
        return x


class TwoStageVAE(StandardGaussianVAE):
    hidden_dims2: Optional[Sequence[int]] = None
    train_stage: int = 1

    @property
    def _hdims2(self):
        return (tuple(self.hidden_dims2) if self.hidden_dims2
                else DEFAULT_HIDDEN_DIMS2)

    def setup(self):
        super().setup()
        hd2 = self._hdims2
        self.encoder2 = _MLPStack(hd2, dtype=self.dtype)
        self.fc_mu2 = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.fc_var2 = nn.Dense(self.latent_dim, dtype=self.dtype)
        self.decoder2 = _MLPStack(tuple(reversed(hd2)), dtype=self.dtype)
        # the upstream decoder2 stops at the last hidden width (:88-98,
        # incomplete); a usable stage needs the projection back to D
        self.fc_out2 = nn.Dense(self.latent_dim, dtype=self.dtype)

    def encode2(self, z: Array, *, train: bool = False):
        feat = self.encoder2(z, train=train)
        return [upcast32(self.fc_mu2(feat)), upcast32(self.fc_var2(feat))]

    def decode2(self, u: Array, *, train: bool = False) -> Array:
        return upcast32(self.fc_out2(self.decoder2(u, train=train)))

    def __call__(self, x: Array, *, train: bool = False,
                 **kwargs) -> ModelOutput:
        out = super().__call__(x, train=train, **kwargs)
        # stage 2 sees stage-1 latents as DATA (stop_gradient): training
        # it never perturbs the stage-1 manifold fit
        z1 = jax.lax.stop_gradient(out["z"])
        mu2, log_var2 = self.encode2(z1, train=train)
        if train:
            u = reparameterize(self.make_rng("reparam"), mu2, log_var2)
        else:
            u = mu2
        out.update({"z1": z1, "mu2": mu2, "log_var2": log_var2,
                    "z_hat": self.decode2(u, train=train)})
        return out

    def loss_function(self, outputs: ModelOutput, *, M_N: float = 1.0,
                      **kwargs) -> Dict[str, Array]:
        if self.train_stage == 2:
            recons_loss = mse_loss(outputs["z_hat"], outputs["z1"])
            kld = gaussian_kl(outputs["mu2"], outputs["log_var2"])
        else:
            # reference loss :158-170 — identical to VanillaVAE
            recons_loss = mse_loss(outputs["recons"], outputs["input"])
            kld = gaussian_kl(outputs["mu"], outputs["log_var"])
        loss = recons_loss + M_N * kld
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "KLD": -kld}

    def sample(self, num_samples: int, *, train: bool = False,
               two_stage: bool = True) -> Array:
        u = jax.random.normal(self.make_rng("reparam"),
                              (num_samples, self.latent_dim))
        z = self.decode2(u, train=train) if two_stage else u
        return self.decode(z, train=train)
