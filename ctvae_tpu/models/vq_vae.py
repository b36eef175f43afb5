"""VQVAE — vector-quantized VAE with residual conv backbone.

Parity target: /root/reference/models/vq_vae.py (loss :194-211; the
``sample`` that raises — :213-216 — maps to ``NotImplementedError``
which the trainer catches like the reference's Warning).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp

from .backbones import VQDecoder, VQEncoder
from .base import Array, BaseVAE, ModelOutput, mse_loss
from .quantizers import VectorQuantizerMS, codebook_perplexity


class VQVAE(BaseVAE):
    in_channels: int = 3
    embedding_dim: int = 64
    num_embeddings: int = 512
    hidden_dims: Optional[Sequence[int]] = None
    beta: float = 0.25
    img_size: int = 64
    grad_estimator: str = "ste"   # "ste" (reference) | "rotation"
    ema: bool = False             # EMA codebook learning + optional
    ema_decay: float = 0.99       # dead-code revival (opt-in, beyond
    revive_threshold: float = 0.0  # the reference — see quantizers.py)
    dtype: jnp.dtype = jnp.float32

    @property
    def _hdims(self):
        return tuple(self.hidden_dims) if self.hidden_dims else (128, 256)

    def setup(self):
        hd = self._hdims
        self.encoder = VQEncoder(hd, self.embedding_dim, dtype=self.dtype)
        self.vq_layer = VectorQuantizerMS(
            self.num_embeddings, self.embedding_dim, self.beta,
            grad_estimator=self.grad_estimator, ema=self.ema,
            ema_decay=self.ema_decay,
            revive_threshold=self.revive_threshold)
        self.decoder = VQDecoder(hd, out_channels=self.in_channels,
                                 dtype=self.dtype)

    def encode(self, x: Array, *, train: bool = False):
        return [self.encoder(x)]

    def decode(self, z: Array, *, train: bool = False) -> Array:
        return self.decoder(z)

    def __call__(self, x: Array, *, train: bool = False, **kwargs) -> ModelOutput:
        encoding = self.encode(x, train=train)[0]
        quantized, vq_loss, inds = self.vq_layer(encoding, inds=True,
                                                 train=train)
        return {"recons": self.decode(quantized, train=train), "input": x,
                "vq_loss": vq_loss,
                "perplexity": codebook_perplexity(inds,
                                                  self.num_embeddings)}

    def loss_function(self, outputs: ModelOutput, **kwargs) -> Dict[str, Array]:
        recons_loss = mse_loss(outputs["recons"], outputs["input"])
        vq_loss = outputs["vq_loss"]
        out = {"loss": recons_loss + vq_loss,
               "Reconstruction_Loss": recons_loss, "VQ_Loss": vq_loss}
        if "perplexity" in outputs:   # absent from hand-built test dicts
            out["Codebook_Perplexity"] = outputs["perplexity"]
        return out
