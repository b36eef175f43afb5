"""MCQVAE — multi-codebook vector-quantized VAE.

Parity target: /root/reference/models/mcq_vae.py:142-317 (model) using the
``MultipleCodebookVectorQuantizer`` from ``quantizers.py``.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from .backbones import VQDecoder, VQEncoder
from .base import Array, BaseVAE, ModelOutput, mse_loss
from .quantizers import (MultipleCodebookVectorQuantizer,
                         codebook_perplexity)


class MCQVAE(BaseVAE):
    in_channels: int = 3
    embedding_dim: int = 64
    num_embeddings: int = 512
    hidden_dims: Optional[Sequence[int]] = None
    beta: float = 0.25
    img_size: int = 64
    codebooks: int = 1
    slicing: str = "chunk"
    grad_estimator: str = "ste"   # "ste" (reference) | "rotation"
    ema: bool = False             # EMA codebook learning + optional
    ema_decay: float = 0.99       # dead-code revival (opt-in, beyond
    revive_threshold: float = 0.0  # the reference — see quantizers.py)
    dtype: jnp.dtype = jnp.float32

    @property
    def _hdims(self):
        return tuple(self.hidden_dims) if self.hidden_dims else (128, 256)

    @property
    def nb_latents(self) -> int:
        """Latent grid side: img_size / 2^n_downsamples (reference
        mcq_vae.py:296)."""
        return self.img_size // (2 ** len(self._hdims))

    def setup(self):
        hd = self._hdims
        self.encoder = VQEncoder(hd, self.embedding_dim, dtype=self.dtype)
        self.vq_layer = MultipleCodebookVectorQuantizer(
            self.num_embeddings, self.embedding_dim, self.codebooks,
            self.beta, slicing=self.slicing,
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
        # pooled over the C codebooks (each shares num_embeddings codes)
        return {"recons": self.decode(quantized, train=train), "input": x,
                "vq_loss": vq_loss,
                "perplexity": codebook_perplexity(inds,
                                                  self.num_embeddings)}

    def sample(self, num_samples: int, *, train: bool = False) -> Array:
        """Random continuous z -> quantize -> decode (reference
        mcq_vae.py:286-307)."""
        z = jax.random.normal(
            self.make_rng("reparam"),
            (num_samples, self.nb_latents, self.nb_latents,
             self.embedding_dim))
        quantized, _ = self.vq_layer(z)
        return self.decode(quantized, train=train)

    def loss_function(self, outputs: ModelOutput, **kwargs) -> Dict[str, Array]:
        recons_loss = mse_loss(outputs["recons"], outputs["input"])
        vq_loss = outputs["vq_loss"]
        out = {"loss": recons_loss + vq_loss,
               "Reconstruction_Loss": recons_loss, "VQ_Loss": vq_loss}
        if "perplexity" in outputs:   # absent from hand-built test dicts
            out["Codebook_Perplexity"] = outputs["perplexity"]
        return out
