"""Zoo-wide serving-export coverage: every registered model family's
``reconstruct`` and ``encode`` entry points must export to a StableHLO
artifact and reproduce the live model without any model code — the
"switch to this framework and find everything" bar applied to serving.
(Deeper per-family checks — sample, CT entry points, poly batch, SPMD —
live in tests/test_export.py.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ctvae_tpu.models import vae_models
from ctvae_tpu.serving import (available_fns, export_fn, load_artifact,
                               make_inference_fn, save_artifact)
from test_export import RNGS
from test_model_zoo import IMG, ZOO, _make_batch

# VQ family tiny configs (the standard zoo list lives in test_model_zoo)
VQ_ZOO = [
    ("VQVAE", dict(embedding_dim=8, num_embeddings=8, hidden_dims=(8, 16),
                   img_size=IMG), {}),
    ("MCQVAE", dict(embedding_dim=8, num_embeddings=8, hidden_dims=(8, 16),
                    img_size=IMG, codebooks=2), {}),
]

ALL = ZOO + VQ_ZOO


@pytest.mark.parametrize("name,kwargs,extra", ALL,
                         ids=[f"{z[0]}-{i}" for i, z in enumerate(ALL)])
def test_zoo_export_round_trip(tmp_path, name, kwargs, extra):
    model = vae_models[name](in_channels=3, **kwargs)
    batch = _make_batch(extra, b=2)
    x = batch["image"]
    init_kw = {k: batch[k] for k in extra}
    variables = model.init(RNGS, x, train=False, **init_kw)

    key = jax.random.PRNGKey(7)
    fns = available_fns(model)
    assert {"reconstruct", "encode"} <= set(fns), (name, fns)

    exported, live, args = {}, {}, {}
    for ep in ("reconstruct", "encode"):
        # label-conditioned models take labels in BOTH entry points
        # (their encoder consumes the label embedding channel)
        call_args = (key, x, batch["labels"]) if "labels" in batch \
            else (key, x)
        fn = make_inference_fn(model, variables, ep)
        out = np.asarray(fn(*call_args))
        assert np.all(np.isfinite(out)), (name, ep)
        exported[ep] = export_fn(fn, call_args, platforms=("cpu",))
        live[ep], args[ep] = out, call_args

    art = save_artifact(str(tmp_path / "art"), exported, {"model": name})
    loaded, manifest = load_artifact(art)
    assert manifest["model"] == name
    for ep in exported:
        got = np.asarray(loaded[ep](*args[ep]))
        # recompiled module: float-level identical, not bit-exact
        np.testing.assert_allclose(got, live[ep], rtol=1e-4, atol=1e-5,
                                   err_msg=f"{name}.{ep}")
    # encode is the metrics repr contract: [B, D]
    assert live["encode"].ndim == 2 and live["encode"].shape[0] == 2, name
