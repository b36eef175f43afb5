"""Shared dtype helpers for the ops layer (and, via models.base
re-export, the model zoo)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def upcast32(x: Array) -> Array:
    """Promote to at least float32 (bf16 compute -> f32 loss math) —
    never downcast: float64 stays float64, which the float64 e2e
    trajectory-parity driver (tests/e2e_trajectory_driver.py) relies
    on."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))
