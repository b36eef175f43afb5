"""End-to-end two-stage CT recipe through the run.py CLI — pretrain,
then weights-only restore + ct_layer-only training (the reference's
headline workflow: run.py:85-89 + configs/ct_mcq_vae.yaml:37-38) — and
the apply_action rollout tool on the resulting checkpoint."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODEL = {"name": "CTMCQVAE", "in_channels": 3, "embedding_dim": 8,
         "action_dim": 8, "num_embeddings": 8, "hidden_dims": [8, 16],
         "img_size": 16, "codebooks": 2, "causal_hidden_dims": [16, 8],
         "gamma": 1.5}


def _config(tmp, logdir, **exp_extra):
    cfg = {
        "model_params": dict(MODEL),
        # limits keep single-core CPU epochs inside XLA's 40 s collective
        # rendezvous window (the grid test split still has >=8 action
        # transitions for apply_action)
        "data_params": {"data_path": "", "dataset_name": "TSynthetic",
                        "train_batch_size": 8, "val_batch_size": 8,
                        "patch_size": 16, "limit": 24, "val_limit": 16},
        "exp_params": {"LR": 0.001, "kld_weight": 0.00025,
                       "manual_seed": 7, **exp_extra},
        "trainer_params": {"max_epochs": 1},
        "logging_params": {"save_dir": logdir, "name": "ct"},
    }
    path = os.path.join(tmp, f"cfg_{len(os.listdir(tmp))}.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def _run(args, cwd=REPO, timeout=1500):
    # persistent compilation cache: the three subprocesses share compiled
    # executables instead of re-tracing the CT model from scratch each
    # time (wall-clock dominated by XLA compiles on the single-core CI)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/ctvae_jax_cache",
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="2")
    r = subprocess.run([sys.executable] + args, capture_output=True,
                       text=True, cwd=cwd, env=env, timeout=timeout)
    assert r.returncode == 0, r.stdout[-800:] + r.stderr[-2000:]
    return r


@pytest.mark.slow
def test_two_stage_recipe_and_apply_action(tmp_path):
    tmp = str(tmp_path)
    logdir = os.path.join(tmp, "logs")

    # stage 1: pretrain everything
    cfg1 = _config(tmp, logdir)
    _run(["run.py", "-c", cfg1])
    ckpt = os.path.join(logdir, "ct", "version_0", "checkpoints", "last")
    assert os.path.isdir(ckpt)

    # stage 2: weights-only restore, train ct_layer only
    cfg2 = _config(tmp, logdir, update_parameters="ct_layer")
    with open(cfg2) as f:
        cfg = yaml.safe_load(f)
    cfg["trainer_params"]["resume_from_checkpoint"] = ckpt
    cfg["trainer_params"]["load_weights_only"] = True
    with open(cfg2, "w") as f:
        yaml.safe_dump(cfg, f)
    r = _run(["run.py", "-c", cfg2])
    assert "loaded weights (only)" in r.stdout

    # apply_action on the stage-2 checkpoint
    ckpt2 = os.path.join(logdir, "ct", "version_1", "checkpoints", "last")
    assert os.path.isdir(ckpt2)
    out = os.path.join(tmp, "images")
    r = _run(["apply_action.py", "-c", cfg2, "--ckpt", ckpt2, "--out", out,
              "--steps", "1"])
    assert "causal_acc mean" in r.stdout or "rollout images" in r.stdout
    rollouts = []
    for root, _, files in os.walk(out):
        rollouts += [f for f in files if f.endswith(".png")]
    assert len(rollouts) >= 1 + 2 * (MODEL["action_dim"] // 2)
