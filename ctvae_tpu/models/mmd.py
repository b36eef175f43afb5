"""Shared MMD machinery for InfoVAE / WAE-MMD.

Parity targets: /root/reference/models/info_vae.py:150-229 and
/root/reference/models/wae_mmd.py:125-204 (identical kernels).

Note the reference's kernel asymmetry, preserved here: the RBF branch
returns the [N,N] kernel *matrix* (later ``.mean()``-ed), while the IMQ
branch returns the off-diagonal *sum* (a scalar) — so for IMQ,
``.mean()`` over a 0-d tensor is the identity and the diagonal is
excluded, whereas RBF includes it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


from ..ops.common import upcast32  # noqa: E402  (single shared definition)


Array = jax.Array


def _pairwise(x1: Array, x2: Array):
    return x1[:, None, :] - x2[None, :, :]          # [N, N, D]


def rbf_kernel(x1: Array, x2: Array, z_var: float) -> Array:
    d = x2.shape[-1]
    sigma = 2.0 * d * z_var
    return jnp.exp(-jnp.mean(jnp.square(_pairwise(x1, x2)), axis=-1) / sigma)


def imq_kernel(x1: Array, x2: Array, z_var: float, eps: float = 1e-7) -> Array:
    d = x2.shape[-1]
    C = 2.0 * d * z_var
    k = C / (eps + C + jnp.sum(jnp.square(_pairwise(x1, x2)), axis=-1))
    return jnp.sum(k) - jnp.sum(jnp.diag(k))        # scalar, diag excluded


def compute_kernel(x1: Array, x2: Array, kernel_type: str, z_var: float) -> Array:
    if kernel_type == "rbf":
        return rbf_kernel(x1, x2, z_var)
    if kernel_type == "imq":
        return imq_kernel(x1, x2, z_var)
    raise ValueError("Undefined kernel type.")


def compute_mmd(rng: Array, z: Array, kernel_type: str, z_var: float,
                prior_z: Array = None) -> Array:
    """MMD(q(z) || N(0, I)) with a fresh prior sample per call.
    ``prior_z`` pins the prior draw (determinism / parity tests)."""
    z = upcast32(z)
    if prior_z is None:
        prior_z = jax.random.normal(rng, z.shape)
    pp = compute_kernel(prior_z, prior_z, kernel_type, z_var)
    zz = compute_kernel(z, z, kernel_type, z_var)
    pz = compute_kernel(prior_z, z, kernel_type, z_var)
    return jnp.mean(pp) + jnp.mean(zz) - 2.0 * jnp.mean(pz)
