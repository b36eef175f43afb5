"""Serving/export subsystem: StableHLO artifact round trips.

The exported blob must reproduce the live model exactly with NO model
code — only jax.export.deserialize — including baked-in weights, the
single-key RNG convention, and (optionally) a symbolic batch dimension.
The reference has no serving path at all (inference = re-building the
Python model in apply_action.ipynb)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctvae_tpu.models import vae_models
from ctvae_tpu.models.base import RNG_STREAMS
from ctvae_tpu.serving import (available_fns, export_fn, load_artifact,
                               make_inference_fn, save_artifact)

RNGS = {"params": jax.random.PRNGKey(0),
        **{s: jax.random.PRNGKey(i + 1)
           for i, s in enumerate(RNG_STREAMS)}}


def _vanilla():
    model = vae_models["VanillaVAE"](in_channels=3, latent_dim=8,
                                     hidden_dims=(8, 16), img_size=16)
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(size=(4, 16, 16, 3)).astype(np.float32))
    variables = model.init(RNGS, x, train=False)
    return model, variables, x


def _ct():
    from ctvae_tpu.models.ct_vae import CTMCQVAE
    model = CTMCQVAE(in_channels=3, embedding_dim=8, action_dim=4,
                     num_embeddings=8, hidden_dims=(16, 32), img_size=16,
                     codebooks=2, causal_hidden_dims=(16, 8), gamma=1.5)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
    action = jax.nn.one_hot(jnp.asarray([1, 3]), 4)
    variables = model.init(RNGS, x, action=action, input_y=y, mode="action",
                           train=False)
    return model, variables, x, y, action


def test_available_fns():
    model, _, _ = _vanilla()
    assert available_fns(model) == ("reconstruct", "encode", "sample")
    ct = _ct()[0]
    assert available_fns(ct) == ("reconstruct", "encode", "sample",
                                 "apply_action", "classify_action")


def test_vanilla_artifact_round_trip(tmp_path):
    model, variables, x = _vanilla()
    key = jax.random.PRNGKey(7)
    exported, live = {}, {}
    args = {"reconstruct": (key, x), "encode": (key, x), "sample": (key,)}
    for name in available_fns(model):
        fn = make_inference_fn(model, variables, name, num_samples=3)
        exported[name] = export_fn(fn, args[name], platforms=("cpu",))
        live[name] = np.asarray(fn(*args[name]))

    out = save_artifact(str(tmp_path / "art"), exported,
                        {"model": "VanillaVAE"})
    fns, manifest = load_artifact(out)
    assert manifest["model"] == "VanillaVAE"
    assert set(fns) == set(args)
    for name in fns:
        got = np.asarray(fns[name](*args[name]))
        # not bit-exact: the deserialized module is re-compiled and XLA
        # may fuse differently; must be float-level identical
        np.testing.assert_allclose(got, live[name], rtol=1e-4, atol=1e-5,
                                   err_msg=name)
    assert live["reconstruct"].shape == (4, 16, 16, 3)
    assert live["sample"].shape == (3, 16, 16, 3)
    assert live["encode"].shape == (4, 8)


def test_ct_artifact_round_trip(tmp_path):
    model, variables, x, y, action = _ct()
    key = jax.random.PRNGKey(9)
    args = {"reconstruct": (key, x),
            "apply_action": (key, x, y, action),
            "classify_action": (key, x, y)}
    exported, live = {}, {}
    for name in args:
        fn = make_inference_fn(model, variables, name)
        exported[name] = export_fn(fn, args[name], platforms=("cpu",))
        live[name] = np.asarray(fn(*args[name]))

    out = save_artifact(str(tmp_path / "art"), exported)
    fns, _ = load_artifact(out)
    for name in args:
        np.testing.assert_allclose(np.asarray(fns[name](*args[name])),
                                   live[name], rtol=1e-4, atol=1e-5,
                                   err_msg=name)
    # classify_action returns a distribution over actions
    probs = live["classify_action"]
    assert probs.shape == (2, 4)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    # the artifact is stochastic-but-deterministic: same key, same output
    np.testing.assert_array_equal(
        np.asarray(fns["apply_action"](*args["apply_action"])),
        np.asarray(fns["apply_action"](*args["apply_action"])))


def test_poly_batch_serves_any_batch_size(tmp_path):
    model, variables, x = _vanilla()
    key = jax.random.PRNGKey(3)
    fn = make_inference_fn(model, variables, "reconstruct")
    exp = export_fn(fn, (key, x), platforms=("cpu",), poly_batch=True)
    out = save_artifact(str(tmp_path / "art"), {"reconstruct": exp})
    fns, manifest = load_artifact(out)
    assert "b" in manifest["functions"]["reconstruct"]["in_avals"][1]
    for b in (1, 4, 7):
        xb = jnp.asarray(np.random.default_rng(b)
                         .uniform(size=(b, 16, 16, 3)).astype(np.float32))
        got = np.asarray(fns["reconstruct"](key, xb))
        np.testing.assert_allclose(got, np.asarray(fn(key, xb)),
                                   rtol=1e-4, atol=1e-5)


def test_conditional_vae_needs_labels(tmp_path):
    model = vae_models["ConditionalVAE"](in_channels=3, latent_dim=8,
                                         num_classes=5, hidden_dims=(8, 16),
                                         img_size=16)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(4, 16, 16, 3)).astype(np.float32))
    labels = jax.nn.one_hot(jnp.asarray([0, 1, 2, 3]), 5)
    variables = model.init(RNGS, x, labels=labels, train=False)
    key = jax.random.PRNGKey(5)
    fn = make_inference_fn(model, variables, "reconstruct")
    exp = export_fn(fn, (key, x, labels), platforms=("cpu",))
    out = save_artifact(str(tmp_path / "art"), {"reconstruct": exp})
    fns, _ = load_artifact(out)
    np.testing.assert_allclose(np.asarray(fns["reconstruct"](key, x, labels)),
                               np.asarray(fn(key, x, labels)),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name,kw", [
    ("HVAE", dict(latent1_dim=8, latent2_dim=4, hidden_dims=(8, 16),
                  img_size=16)),
    ("LVAE", dict(latent_dims=(4, 8), hidden_dims=(8, 16), img_size=16)),
])
def test_encode_export_stochastic_and_ladder(tmp_path, name, kw):
    """HVAE's encode draws an rng sample; LVAE's returns per-rung (mu,
    log_var) tuples — the encode entry point must handle both (it derives
    rng streams from the key and unwraps to the first array)."""
    model = vae_models[name](in_channels=3, **kw)
    x = jnp.asarray(np.random.default_rng(4)
                    .uniform(size=(2, 16, 16, 3)).astype(np.float32))
    variables = model.init(RNGS, x, train=False)
    key = jax.random.PRNGKey(13)
    fn = make_inference_fn(model, variables, "encode")
    exp = export_fn(fn, (key, x), platforms=("cpu",))
    out = save_artifact(str(tmp_path / "art"), {"encode": exp})
    fns, _ = load_artifact(out)
    got = np.asarray(fns["encode"](key, x))
    assert got.ndim == 2 and got.shape[0] == 2
    np.testing.assert_allclose(got, np.asarray(fn(key, x)),
                               rtol=1e-4, atol=1e-5)


def test_spmd_artifact_over_8_device_mesh(tmp_path):
    """Pod-scale serving: export CT classify_action SPMD over the 8-device
    mesh (batch sharded on the data axis, key replicated); the deserialized
    module must run on the same-size device set and match the live model."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    model, variables, x, y, _ = _ct()
    # batch must tile the mesh: 8 samples over 8 devices
    rng = np.random.default_rng(3)
    x8 = jnp.asarray(rng.uniform(size=(8, 16, 16, 3)).astype(np.float32))
    y8 = jnp.asarray(rng.uniform(size=(8, 16, 16, 3)).astype(np.float32))
    key = jax.random.PRNGKey(11)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    fn = make_inference_fn(model, variables, "classify_action")
    exp = export_fn(fn, (key, x8, y8), platforms=("cpu",), mesh=mesh)
    out = save_artifact(str(tmp_path / "art"), {"classify_action": exp})
    fns, manifest = load_artifact(out)
    assert manifest["functions"]["classify_action"]["nr_devices"] == 8

    shard = NamedSharding(mesh, PartitionSpec("data", None, None, None))
    got = np.asarray(fns["classify_action"](
        key, jax.device_put(x8, shard), jax.device_put(y8, shard)))
    np.testing.assert_allclose(got, np.asarray(fn(key, x8, y8)),
                               rtol=1e-4, atol=1e-5)


def test_vq_family_has_sample_but_base_raises():
    # MCQVAE overrides sample (random z -> quantize -> decode); a model
    # that doesn't override it must not list it.
    from ctvae_tpu.models.base import BaseVAE

    class NoSampler(BaseVAE):
        def __call__(self, x, *, train=False, **kw):
            return {"recons": x, "input": x}

        def encode(self, x, train=False):
            return (x.reshape(x.shape[0], -1),)

    assert "sample" not in available_fns(NoSampler())
