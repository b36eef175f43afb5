"""Shared convolutional backbones.

Two families exist in the reference:

* the "standard" VAE backbone — stride-2 3x3 Conv/BatchNorm/LeakyReLU
  pyramid with ``hidden_dims=[32,64,128,256,512]`` and a mirrored
  ConvTranspose decoder ending in Tanh
  (/root/reference/models/vanilla_vae.py:24-75),
* the VQ backbone — stride-2 4x4 convs + six residual blocks
  (/root/reference/models/vq_vae.py:94-122, mcq_vae.py:161-239).

TPU-first choices: NHWC layout, 'SAME' padding (identical shapes to the
torch k3/k4-s2-p1 configs on even inputs), optional bfloat16 compute dtype
with float32 params, LeakyReLU slope 0.01 (torch default).

Unlike the reference — which hard-codes ``out_channels=3`` in most final
layers (/root/reference/models/vanilla_vae.py:73) — every decoder here
respects ``out_channels`` so 1-channel datasets (DSprites) work with all
models (SURVEY.md §2.3 note).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


from ..ops.common import upcast32  # noqa: E402  (single shared definition)


Array = jax.Array

DEFAULT_HIDDEN_DIMS = (32, 64, 128, 256, 512)


def leaky_relu(x: Array) -> Array:
    return nn.leaky_relu(x, negative_slope=0.01)


class ConvBNBlock(nn.Module):
    """Conv(s2 k3) -> BatchNorm -> LeakyReLU, NHWC."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        # explicit (1,1) padding == torch Conv2d(k3, s2, p1) exactly;
        # XLA 'SAME' would pad (0,1) — same shape, shifted values
        # (verified numerically in tests/test_backbone_parity.py)
        x = nn.Conv(self.features, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return leaky_relu(x)


class DeconvBNBlock(nn.Module):
    """ConvTranspose(s2 k3) -> BatchNorm -> LeakyReLU (2x upsample)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        # (1,2) padding == torch ConvTranspose2d(k3, s2, p1,
        # output_padding=1) up to torch's kernel flip (converters flip;
        # for training from scratch the init distribution is symmetric)
        x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2),
                             padding=((1, 2), (1, 2)), dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return leaky_relu(x)


class ConvEncoder(nn.Module):
    """The standard stride-2 pyramid. [B,H,W,C] -> [B, H/2^L, W/2^L, hd[-1]].

    Reference: /root/reference/models/vanilla_vae.py:24-35.
    """

    hidden_dims: Sequence[int] = DEFAULT_HIDDEN_DIMS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        for h in self.hidden_dims:
            x = ConvBNBlock(h, dtype=self.dtype)(x, train=train)
        return x


class ConvDecoder(nn.Module):
    """Mirrored ConvTranspose pyramid + final activation.

    Reference: /root/reference/models/vanilla_vae.py:40-75. The input is the
    [B, h, w, hidden_dims[-1]] feature map (callers reshape the latent).
    ``final_activation``: "tanh" ([-1, 1], the zoo default), "sigmoid"
    ([0, 1] — GammaVAE, /root/reference/models/gamma_vae.py:80), or
    "none".
    """

    hidden_dims: Sequence[int] = DEFAULT_HIDDEN_DIMS
    out_channels: int = 3
    final_activation: str = "tanh"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        rev = list(self.hidden_dims)[::-1]
        for h in rev[1:]:
            x = DeconvBNBlock(h, dtype=self.dtype)(x, train=train)
        # final_layer: deconv to same width, BN, LeakyReLU, 3x3 conv, act
        x = DeconvBNBlock(rev[-1], dtype=self.dtype)(x, train=train)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", dtype=self.dtype)(x)
        if self.final_activation == "tanh":
            x = jnp.tanh(x)
        elif self.final_activation == "sigmoid":
            x = jax.nn.sigmoid(x)
        return upcast32(x)


class GaussianHead(nn.Module):
    """Flatten + twin Linear heads for (mu, log_var).

    Reference: fc_mu/fc_var over the flattened 2x2x512 feature map
    (/root/reference/models/vanilla_vae.py:36-37, 84-92).
    """

    latent_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat: Array):
        flat = feat.reshape(feat.shape[0], -1)
        mu = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc_mu")(flat)
        log_var = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc_var")(flat)
        return upcast32(mu), upcast32(log_var)


class DecoderInput(nn.Module):
    """Linear latent -> [B, h, w, C] feature map (reference decoder_input,
    /root/reference/models/vanilla_vae.py:43,101-102)."""

    features: int          # channel count of the feature map
    spatial: int = 2       # h = w = spatial
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        x = nn.Dense(self.features * self.spatial * self.spatial,
                     dtype=self.dtype, name="decoder_input")(z)
        return x.reshape(z.shape[0], self.spatial, self.spatial, self.features)


# ---------------------------------------------------------------------------
# VQ-family backbone (k4-s2 convs + residual stacks)
# ---------------------------------------------------------------------------

class ResidualLayer(nn.Module):
    """3x3 conv -> ReLU -> 1x1 conv with skip — matches the reference
    ``ResidualLayer`` exactly (/root/reference/models/vq_vae.py:57-70:
    ``Sequential(Conv3x3, ReLU, Conv1x1)``, bias-free convs, added to
    the input; note there is NO activation before the 3x3 conv)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        r = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        r = nn.relu(r)
        r = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(r)
        return x + r


class VQEncoder(nn.Module):
    """k4-s2 downsampling stack + 3x3 conv + 6 residual layers + 1x1 conv to
    ``embedding_dim`` (reference MCQVAE encoder,
    /root/reference/models/mcq_vae.py:161-194)."""

    hidden_dims: Sequence[int] = (128, 256)
    embedding_dim: int = 64
    num_residual: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for h in self.hidden_dims:
            x = nn.Conv(h, (4, 4), strides=(2, 2), padding="SAME",
                        dtype=self.dtype)(x)
            x = leaky_relu(x)
        x = nn.Conv(self.hidden_dims[-1], (3, 3), padding="SAME",
                    dtype=self.dtype)(x)
        x = leaky_relu(x)
        for _ in range(self.num_residual):
            x = ResidualLayer(self.hidden_dims[-1], dtype=self.dtype)(x)
        x = leaky_relu(x)
        x = nn.Conv(self.embedding_dim, (1, 1), dtype=self.dtype)(x)
        x = leaky_relu(x)
        return x


class VQDecoder(nn.Module):
    """Mirror of ``VQEncoder`` (reference MCQVAE decoder,
    /root/reference/models/mcq_vae.py:201-239)."""

    hidden_dims: Sequence[int] = (128, 256)
    out_channels: int = 3
    num_residual: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: Array) -> Array:
        rev = list(self.hidden_dims)[::-1]
        x = nn.Conv(rev[0], (3, 3), padding="SAME", dtype=self.dtype)(z)
        x = leaky_relu(x)
        for _ in range(self.num_residual):
            x = ResidualLayer(rev[0], dtype=self.dtype)(x)
        x = leaky_relu(x)
        for h in rev[1:]:
            x = nn.ConvTranspose(h, (4, 4), strides=(2, 2), padding="SAME",
                                 dtype=self.dtype)(x)
            x = leaky_relu(x)
        x = nn.ConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype)(x)
        return upcast32(jnp.tanh(x))
