"""Force an 8-device CPU mesh for all tests — the TPU-native substitute for
multi-node test clusters (SURVEY.md §4 implication)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compilation cache: repeat suite runs (and the CLI tests'
# subprocesses) reuse compiled executables instead of re-compiling the
# CT model for ~minutes each on the single-core CI host
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ctvae_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax  # noqa: E402  (import after env setup)

# A pytest plugin may have imported jax before this conftest ran, freezing
# the config read of JAX_PLATFORMS; override explicitly (works as long as
# no backend has been initialized yet).
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS above covers it

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
