"""Base protocol for every VAE model in the zoo.

Mirrors the capability surface of the reference ``BaseVAE``
(/root/reference/models/base.py:5-28): ``encode / decode / sample /
generate / forward / loss_function`` — redesigned functionally for JAX:

* ``__call__`` returns a ``dict`` of named tensors (instead of the
  reference's positional list) so the loss can be a pure function,
* ``loss_function`` receives that dict plus explicit scalars (``M_N``
  weighting, global ``step`` for annealing schedules, ``optimizer_idx``
  for adversarial models) and returns a dict with at least
  ``{"loss", "Reconstruction_Loss"}``. All values are 0-d arrays except
  image-like diagnostics (2-D/3-D), which the logger routes to image
  writers exactly like the reference's ``log_all``
  (/root/reference/experiment.py:87-110).
* randomness comes from named Flax PRNG streams: ``"reparam"`` (Gaussian /
  posterior sampling), ``"gumbel"`` (categorical relaxations), ``"noise"``
  (auxiliary noise), ``"dropout"``.

Models are NHWC: inputs are ``[B, H, W, C]`` float32/bfloat16 in [0, 1].
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array
ModelOutput = Dict[str, Any]

# PRNG stream names every trainer must provide when a model is stochastic.
RNG_STREAMS = ("reparam", "gumbel", "noise", "dropout")


class BaseVAE(nn.Module):
    """Common superclass. Subclasses implement ``encode``, ``decode``,
    ``__call__`` and the static ``loss_function``.

    ``loss_function`` is deliberately *not* parameterized: it must be pure
    arithmetic over the ``__call__`` output dict, so that
    ``loss_fn = lambda params: model.apply(...)`` composes with
    ``jax.value_and_grad`` without a second ``apply``.
    """

    def encode(self, x: Array) -> Sequence[Array]:
        raise NotImplementedError

    def decode(self, z: Array) -> Array:
        raise NotImplementedError

    def sample(self, num_samples: int, *, train: bool = False) -> Array:
        """Draw images from the prior. Models without an ancestral sampler
        (WAE/SWAE variants are deterministic; VQ models have no usable
        prior, cf. /root/reference/models/vq_vae.py:213-216) raise
        ``NotImplementedError`` — the trainer treats that exactly like the
        reference treats the raised ``Warning``."""
        raise NotImplementedError(f"{type(self).__name__} cannot sample from a prior")

    def generate(self, x: Array, **kwargs) -> Array:
        """Reconstruct ``x`` (reference ``generate``)."""
        return self(x, **kwargs)["recons"]

    def loss_function(self, outputs: ModelOutput, **kwargs) -> Dict[str, Array]:
        raise NotImplementedError


# ---------------------------------------------------------------------------
# Shared loss helpers (pure jnp; fused by XLA into the surrounding step).
# ---------------------------------------------------------------------------

# Canonical definition lives in ops.common; re-exported here because the
# whole model zoo imports it from models.base.
from ..ops.common import upcast32  # noqa: E402


def mse_loss(pred: Array, target: Array) -> Array:
    """Mean-reduced MSE, matching ``F.mse_loss`` defaults."""
    diff = upcast32(pred) - upcast32(target)
    return jnp.mean(jnp.square(diff))


def gaussian_kl(mu: Array, log_var: Array) -> Array:
    """KL(N(mu, sigma) || N(0, 1)) summed over latent dim, mean over batch
    (reference /root/reference/models/vanilla_vae.py:143)."""
    mu = upcast32(mu)
    log_var = upcast32(log_var)
    per_ex = -0.5 * jnp.sum(1.0 + log_var - jnp.square(mu) - jnp.exp(log_var), axis=1)
    return jnp.mean(per_ex)


def reparameterize(rng: Array, mu: Array, log_var: Array) -> Array:
    """Gaussian reparameterization trick."""
    std = jnp.exp(0.5 * log_var)
    eps = jax.random.normal(rng, std.shape, dtype=std.dtype)
    return mu + eps * std


def cross_entropy_from_probs(probs: Array, labels: Array, eps: float = 1e-4) -> Array:
    """CE over probabilities clamped then logged — reproduces the reference
    idiom ``F.cross_entropy(p.clamp(min=1e-4).log(), y)`` which treats the
    clamped log-probs as *logits* (an extra log-softmax is applied inside
    torch's cross_entropy; we match that semantics exactly, e.g.
    /root/reference/models/ct_mcq_vae.py:609)."""
    logits = jnp.log(jnp.clip(upcast32(probs), eps, None))
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll)


def scalar(x) -> Array:
    return jnp.asarray(x, dtype=jnp.float32)
