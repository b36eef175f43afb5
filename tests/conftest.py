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

# -- quick CI tier (`pytest -m quick`) --------------------------------
# One representative, fast test per subsystem (~10 min contended on the
# 1-core CI host vs ~80+ min for the full suite). Curated here rather
# than scattered as decorators so the tier's composition is auditable
# in one place.
QUICK_TESTS = {
    "test_loss_golden.py::test_vanilla_vae_loss_closed_form",   # losses
    "test_vq.py::test_quantizer_inds_and_straight_through",     # VQ ops
    "test_ct_vae.py::test_dense_gatv2_matches_sparse_semantics",  # GAT
    "test_ct_vae.py::test_causal_transition_modes",     # CT internals
    "test_data.py::test_vaedataset_end_to_end_synthetic",  # data layer
    "test_disent_loaders.py::test_dsprites_loader",     # disent readers
    "test_native.py::test_crop_resize_matches_pil_downscale",  # C++ ext
    "test_metrics.py::test_mig_analytic_exact",         # metrics
    "test_parallel.py::test_tp_step_matches_dp_step",   # sharding
    "test_experiment.py::test_fit_trains_and_checkpoints",  # train loop
    "test_export.py::test_vanilla_artifact_round_trip",  # serving
    "test_hyp_search_cli.py::test_sample_params_to_tune_semantics",
    "test_dataset_tools.py::test_celeba_get_batch_native_matches_getitem",
    "test_reference_parity.py::test_vanilla_loss_parity",  # torch parity
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("/")[-1]
        base = rel.split("[")[0]
        if base in QUICK_TESTS:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
