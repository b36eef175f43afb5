"""MS-SSIM loss, NHWC, pure XLA (depthwise convs fuse well on TPU).

Parity target: the reference ``MSSIM`` module
(/root/reference/models/mssim_vae.py:182-280): 5 scales with the fixed
weights [0.0448, 0.2856, 0.3001, 0.2363, 0.1333], 11x11 window, sigma 1.5,
C1=(0.01)^2, C2=(0.03)^2, avg-pool 2x2 between scales, final
``prod(cs[:-1]^w[:-1]) * ssim[-1]^w[-1]`` and ``1 - output``.

Deviation, by design: the reference's window builder drops the minus sign
in the Gaussian exponent (``exp(+(x-c)^2/2s^2)``, mssim_vae.py:204),
producing an inverted (edge-heavy) window; we use the actual Gaussian.
``window_mode="reference"`` reproduces the reference window exactly
(positive exponent, computed in float64 then cast to float32 like the
reference's ``.float()`` at mssim_vae.py:210) for drop-in numerical
compatibility.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


from .common import upcast32  # noqa: E402  (single shared definition)

import numpy as np

Array = jax.Array

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.lru_cache(maxsize=None)
def _window_np(window_size: int, sigma: float,
               window_mode: str = "gaussian") -> np.ndarray:
    x = np.arange(window_size) - window_size // 2
    sign = 1.0 if window_mode == "reference" else -1.0
    k1d = np.exp(sign * (x ** 2) / (2.0 * sigma ** 2))
    k1d /= k1d.sum()
    return np.outer(k1d, k1d).astype(np.float32)


def _depthwise_filter(x: Array, window: Array) -> Array:
    """Depthwise 2-D conv, NHWC, SAME padding.

    The window is built in float32 (like the reference's ``.float()``
    cast, mssim_vae.py:210) and widened to the input dtype here, so
    float64 parity runs see the same float32-rounded taps as torch."""
    c = x.shape[-1]
    window = window.astype(x.dtype)
    kernel = jnp.tile(window[:, :, None, None], (1, 1, 1, c))  # [H,W,1,C]
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _ssim(img1: Array, img2: Array, window: Array):
    mu1 = _depthwise_filter(img1, window)
    mu2 = _depthwise_filter(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_filter(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_filter(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_filter(img1 * img2, window) - mu1_mu2

    C1, C2 = 0.01 ** 2, 0.03 ** 2
    v1 = 2.0 * sigma12 + C2
    v2 = sigma1_sq + sigma2_sq + C2
    cs = jnp.mean(v1 / v2)
    ssim_map = ((2 * mu1_mu2 + C1) * v1) / ((mu1_sq + mu2_sq + C1) * v2)
    return jnp.mean(ssim_map), cs


def _avg_pool2(x: Array) -> Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def mssim_loss(img1: Array, img2: Array, window_size: int = 11,
               sigma: float = 1.5, normalize: bool = True,
               window_mode: str = "gaussian") -> Array:
    """Returns ``1 - MS-SSIM(img1, img2)``; inputs NHWC float.

    ``normalize`` maps ssim/cs into [0, 1] via ``(x+1)/2`` before the
    fractional powers — the stabilization the reference ships commented
    out (mssim_vae.py:271-274); without it, negative cs values at early
    training NaN the loss (pow of a negative base). Default on."""
    img1 = upcast32(img1)
    img2 = upcast32(img2)
    window = jnp.asarray(_window_np(window_size, sigma, window_mode))
    weights = jnp.asarray(_MSSSIM_WEIGHTS)
    mssim, mcs = [], []
    for _ in range(len(_MSSSIM_WEIGHTS)):
        sim, cs = _ssim(img1, img2, window)
        mssim.append(sim)
        mcs.append(cs)
        img1 = _avg_pool2(img1)
        img2 = _avg_pool2(img2)
    mssim = jnp.stack(mssim)
    mcs = jnp.stack(mcs)
    if normalize:
        mssim = (mssim + 1) / 2
        mcs = (mcs + 1) / 2
    pow1 = mcs ** weights
    pow2 = mssim ** weights
    output = jnp.prod(pow1[:-1] * pow2[-1])
    return 1.0 - output
