"""End-to-end two-stage CT recipe through the run.py entry point —
pretrain, then weights-only restore + ct_layer-only training (the
reference's headline workflow: run.py:85-89 + configs/ct_mcq_vae.yaml:37-38)
— and the apply_action rollout tool on the resulting checkpoint.

Stages run IN-PROCESS (main() with patched argv) sharing the hermetic
CPU backend from conftest.py; a separate bounded subprocess smoke test
certifies the actual ``python run.py`` exec path with the in-entry-point
platform override (round-1 subprocess tests hung on hosts whose
sitecustomize pre-registers an accelerator backend)."""

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


def _main_inprocess(monkeypatch, capsys, script, argv):
    import importlib
    mod = importlib.import_module(script)
    monkeypatch.setattr(sys, "argv", [script + ".py"] + argv)
    mod.main()
    return capsys.readouterr().out


@pytest.mark.slow
def test_two_stage_recipe_and_apply_action(tmp_path, monkeypatch, capsys):
    tmp = str(tmp_path)
    logdir = os.path.join(tmp, "logs")

    # stage 1: pretrain everything
    cfg1 = _config(tmp, logdir)
    _main_inprocess(monkeypatch, capsys, "run", ["-c", cfg1])
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
    out = _main_inprocess(monkeypatch, capsys, "run", ["-c", cfg2])
    assert "loaded weights (only)" in out

    # apply_action on the stage-2 checkpoint
    ckpt2 = os.path.join(logdir, "ct", "version_1", "checkpoints", "last")
    assert os.path.isdir(ckpt2)
    imgdir = os.path.join(tmp, "images")
    out = _main_inprocess(monkeypatch, capsys, "apply_action",
                          ["-c", cfg2, "--ckpt", ckpt2, "--out", imgdir,
                           "--steps", "1", "--walk", "2,2,1",
                           "--navigate", "1"])
    assert "causal_acc mean" in out or "rollout images" in out
    rollouts, walks, navs = [], [], []
    for root, _, files in os.walk(imgdir):
        rollouts += [f for f in files if f.endswith(".png")]
        walks += [f for f in files if f.startswith("CT-VAE_walk")]
        navs += [f for f in files if f.startswith("CT-VAE_navigate")]
    assert len(rollouts) >= 1 + 2 * (MODEL["action_dim"] // 2)
    assert len(walks) == 4            # 2 walks x 2 steps
    assert len(navs) == 3             # x, 1 intermediate, y


def test_run_cli_disentanglement_metrics_wiring(tmp_path, monkeypatch,
                                                capsys):
    """exp_params.metrics must flow run.py -> MetricSet over the raw
    factor dataset -> val_<Metric> keys in validation output (the
    reference's run.py:66-76 wiring) — the metric math itself is pinned
    in test_metrics.py; this certifies the CLI plumbing."""
    tmp = str(tmp_path)
    logdir = os.path.join(tmp, "logs")
    cfg = {
        "model_params": {"name": "VanillaVAE", "in_channels": 3,
                         "latent_dim": 4, "img_size": 16,
                         "hidden_dims": [8, 16]},
        "data_params": {"data_path": "", "dataset_name": "Synthetic",
                        "train_batch_size": 8, "val_batch_size": 8,
                        "patch_size": 16, "limit": 16, "val_limit": 8},
        "exp_params": {"LR": 0.001, "kld_weight": 0.005, "manual_seed": 1,
                       "metrics": ["MIG"]},
        "trainer_params": {"max_epochs": 1},
        "logging_params": {"save_dir": logdir, "name": "vv_metrics"},
    }
    path = os.path.join(tmp, "cfg.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    out = _main_inprocess(monkeypatch, capsys, "run", ["-c", path])
    # disent-style metric keys, exactly what the reference logs
    # (metrics/metric.py returns e.g. {"mig.discrete_score": ...})
    assert "val_mig.discrete_score" in out, out


@pytest.mark.slow
def test_run_cli_subprocess_smoke(tmp_path):
    """The actual ``python run.py`` exec path must be hermetic under
    JAX_PLATFORMS=cpu: the entry point applies the platform override
    in-process (ctvae_tpu/utils/platform.py), so this cannot touch (or
    hang on) a site-registered accelerator runtime. Single CPU device,
    tiny VanillaVAE — bounded well under the timeout."""
    tmp = str(tmp_path)
    logdir = os.path.join(tmp, "logs")
    cfg = {
        "model_params": {"name": "VanillaVAE", "in_channels": 3,
                         "latent_dim": 4, "img_size": 16,
                         "hidden_dims": [8, 16]},
        "data_params": {"data_path": "", "dataset_name": "Synthetic",
                        "train_batch_size": 8, "val_batch_size": 8,
                        "patch_size": 16, "limit": 16, "val_limit": 8},
        "exp_params": {"LR": 0.001, "kld_weight": 0.005,
                       "manual_seed": 1},
        "trainer_params": {"max_epochs": 1},
        "logging_params": {"save_dir": logdir, "name": "vv"},
    }
    path = os.path.join(tmp, "cfg.yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR="/tmp/ctvae_jax_cache",
               JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="2")
    # single device: drop the 8-virtual-device flag inherited from
    # conftest so the subprocess compiles the cheapest possible step
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "").strip()
    r = subprocess.run([sys.executable, "run.py", "-c", path],
                       capture_output=True, text=True, cwd=REPO, env=env,
                       timeout=1800)
    assert r.returncode == 0, r.stdout[-800:] + r.stderr[-2000:]
    assert "on 1 device(s)" in r.stdout, r.stdout[-800:]
    assert os.path.isdir(os.path.join(logdir, "vv", "version_0",
                                      "checkpoints", "last"))
