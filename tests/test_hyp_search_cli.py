"""End-to-end hyperparameter search through the CLI — the reference's
Ray-Tune entry point (/root/reference/hyperparameter_search.py:19-99)
re-implemented as a seeded random search; this drives the same YAML
schema (``hyperparameter_search:`` section, list -> choice) on a tiny
synthetic run and checks trial sampling + best-trial selection."""

import json
import os
import subprocess
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd=REPO, timeout=1500):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/ctvae_jax_cache",
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="2")
    r = subprocess.run([sys.executable] + args, capture_output=True,
                       text=True, cwd=cwd, env=env, timeout=timeout)
    assert r.returncode == 0, r.stdout[-800:] + r.stderr[-2000:]
    return r


@pytest.mark.slow
def test_hyp_search_cli(tmp_path):
    tmp = str(tmp_path)
    logdir = os.path.join(tmp, "logs")
    cfg = {
        "model_params": {"name": "VanillaVAE", "in_channels": 3,
                         "latent_dim": [4, 8], "img_size": 16,
                         "hidden_dims": [8, 16]},
        "data_params": {"data_path": "", "dataset_name": "Synthetic",
                        "train_batch_size": 8, "val_batch_size": 8,
                        "patch_size": 16, "limit": 24, "val_limit": 16},
        "exp_params": {"LR": [0.0005, 0.002], "kld_weight": 0.005,
                       "manual_seed": 3},
        "trainer_params": {"max_epochs": 1},
        "logging_params": {"save_dir": logdir, "name": "VanillaVAE"},
        "hyperparameter_search": {
            "num_samples": 2,
            "params": {"model_params": ["latent_dim"],
                       "exp_params": ["LR"]},
        },
    }
    path = os.path.join(tmp, "hyp.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)

    r = _run(["hyperparameter_search.py", "-c", path])
    assert "=== best ===" in r.stdout

    results_path = os.path.join(logdir, "VanillaVAE", "hyp_search",
                                "results.json")
    with open(results_path) as f:
        results = json.load(f)
    assert len(results["trials"]) == 2
    best = results["best"]
    losses = [t["loss"] for t in results["trials"]]
    assert best["loss"] == min(losses)
    # searched dims were sampled from their choice lists / uniform ranges
    for t in results["trials"]:
        assert t["params"]["model_params"]["latent_dim"] in (4, 8)
        assert 0.0005 <= t["params"]["exp_params"]["LR"] <= 0.002
