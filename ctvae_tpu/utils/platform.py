"""Authoritative platform selection for CLI entry points.

On hosts where a PJRT plugin is registered at interpreter start (e.g. a
``sitecustomize``-installed TPU backend), the ``JAX_PLATFORMS``
environment variable alone does not reliably select the backend for a
subprocess: the plugin registration can pin the platform before user
code runs. ``jax.config.update("jax_platforms", ...)`` *is*
authoritative as long as no backend has initialized yet, so every entry
point calls :func:`apply_platform_overrides` immediately after
``import jax`` and before any device query.

This is what makes the CLI round-trip tests hermetic: they launch
``run.py`` / ``hyperparameter_search.py`` / ``apply_action.py``
subprocesses with ``JAX_PLATFORMS=cpu`` and must never touch (or hang
on) a real accelerator runtime.
"""

from __future__ import annotations

import os


def apply_platform_overrides() -> None:
    """Honor ``JAX_PLATFORMS`` / ``CTVAE_PLATFORM`` and
    ``CTVAE_NUM_CPU_DEVICES`` via ``jax.config`` (not just env vars).

    Safe to call multiple times; a no-op once a backend exists (jax
    raises, which we let propagate only if the requested platform would
    actually change — otherwise silently keep the initialized backend).
    """
    import jax

    plat = os.environ.get("JAX_PLATFORMS") or os.environ.get("CTVAE_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            if jax.default_backend() not in plat.split(","):
                raise
    n = os.environ.get("CTVAE_NUM_CPU_DEVICES")
    if n:
        try:
            jax.config.update("jax_num_cpu_devices", int(n))
        except Exception:
            pass  # older jax: XLA_FLAGS --xla_force_host_platform_device_count
