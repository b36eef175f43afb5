"""Every shipped config must construct its model and run one training
loss at its configured image size — the drop-in-compatibility contract
for users migrating from the reference's ``configs/`` tree
(/root/reference/configs, same YAML schema).

Uses batch size 2 and random data; this pins YAML <-> constructor drift
(renamed kwargs, bad dtype strings, hidden_dims tuples) for all 27
configs, not just the ones other tests pick."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest
import yaml

from ctvae_tpu.models import build_model
from ctvae_tpu.models.base import RNG_STREAMS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*.yaml")))


def _rngs(seed=0):
    rng = jax.random.PRNGKey(seed)
    return {"params": rng, **{s: jax.random.fold_in(rng, i + 1)
                              for i, s in enumerate(RNG_STREAMS)}}


@pytest.mark.slow
@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds_and_losses(path):
    with open(path) as f:
        cfg = yaml.safe_load(f)
    mp = cfg["model_params"]
    model = build_model(mp)
    img = int(mp.get("img_size", cfg["data_params"].get("patch_size", 64)))
    ch = int(mp.get("in_channels", 3))
    B = 2
    rng = jax.random.PRNGKey(1)
    batch = {"image": jax.random.uniform(rng, (B, img, img, ch),
                                         jnp.float32)}
    kwargs = {}
    if mp["name"] == "CTMCQVAE":
        a = int(mp["action_dim"])
        kwargs = {"input_y": batch["image"],
                  "action": jax.nn.one_hot(jnp.arange(B) % a, a),
                  "mode": "action"}
    elif mp["name"] == "ConditionalVAE":
        kwargs = {"labels": jax.nn.one_hot(
            jnp.arange(B) % int(mp["num_classes"]), int(mp["num_classes"]))}
    variables = model.init(_rngs(), batch["image"], train=True, **kwargs)
    outputs = model.apply(variables, batch["image"], train=True,
                          rngs={s: jax.random.PRNGKey(3 + i)
                                for i, s in enumerate(RNG_STREAMS)},
                          step=jnp.array(0),
                          mutable=["batch_stats"], **kwargs)[0]
    kld = float(cfg.get("exp_params", {}).get("kld_weight", 0.005))
    losses = model.loss_function(outputs, M_N=kld, step=jnp.array(0),
                                 train=True, optimizer_idx=0,
                                 rng=jax.random.PRNGKey(9))
    loss = float(losses["loss"])
    assert loss == loss, f"{os.path.basename(path)}: loss is NaN"
