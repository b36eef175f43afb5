"""End-task causal learning: BOTH frameworks must clear chance on the
same TSynthetic data at a bounded smoke scale (round-2 VERDICT item 3).

Step-level parity cannot certify the headline metric (CT trajectories
decohere from float noise by construction — see PARITY.md), so this is
the outcome-level comparison: the torch reference
(scripts/reference_causal_train.py, the reference's own model + Adam
recipe, /root/reference/models/ct_mcq_vae.py:325-333) and ctvae_tpu
train on the IDENTICAL batch stream (same datamodule, same seed) for 15
epochs on a 96-image factor grid, and each must push val causal
accuracy decisively above chance (acc chance 1/8, undirected chance
1/4; thresholds sit >3 sigma above chance over the ~240 pooled
last-5-epoch val samples, and the measured margins at this pinned seed
are ~2x the thresholds: torch 0.40/0.60, jax 0.37/0.55).

The full-scale 60-epoch side-by-side (5,5,3,4 grid, batch 16, multiple
seeds) is recorded in PARITY.md.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EPOCHS = 15
FACTOR_SIZES = (4, 4, 2, 3)
BATCH = 8
SEED = 1265
ACC_THRESHOLD = 0.20          # chance 0.125
NODIR_THRESHOLD = 0.33        # chance 0.25


def _last5_mean(traj_acc, traj_nodir):
    return float(np.mean(traj_acc[-5:])), float(np.mean(traj_nodir[-5:]))


@pytest.mark.slow
def test_reference_clears_chance_on_tsynthetic(tmp_path):
    """The torch reference, trained end-to-end on TSynthetic at smoke
    scale by its own recipe, clears chance on its headline metric."""
    out = os.path.join(str(tmp_path), "ref.json")
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "reference_causal_train.py"),
         "--epochs", str(EPOCHS), "--batch", str(BATCH),
         "--seed", str(SEED),
         "--factor-sizes", ",".join(map(str, FACTOR_SIZES)),
         "--out", out],
        capture_output=True, text=True, timeout=3000, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(out) as f:
        res = json.load(f)
    acc, nodir = _last5_mean(
        [t["causal_acc"] for t in res["trajectory"]],
        [t["causal_nodir_acc"] for t in res["trajectory"]])
    assert acc >= ACC_THRESHOLD, (acc, res["trajectory"])
    assert nodir >= NODIR_THRESHOLD, (nodir, res["trajectory"])


@pytest.mark.slow
def test_ctvae_tpu_clears_chance_on_tsynthetic():
    """ctvae_tpu, trained on the IDENTICAL batch stream (same
    datamodule + seed as the reference test above), clears chance by
    the same margins."""
    from ctvae_tpu.data import VAEDataset
    from ctvae_tpu.models import build_model
    from ctvae_tpu.training import VAEXperiment

    model = build_model({
        "name": "CTMCQVAE", "in_channels": 3, "embedding_dim": 8,
        "action_dim": 2 * len(FACTOR_SIZES), "hidden_dims": [8, 16],
        "num_embeddings": 8, "img_size": 16, "codebooks": 2,
        "causal_hidden_dims": [16, 8], "gamma": 1.5})
    data = VAEDataset("", dataset_name="TSynthetic",
                      train_batch_size=BATCH, val_batch_size=BATCH,
                      patch_size=16, distributed=False, seed=SEED,
                      factor_sizes=FACTOR_SIZES)
    data.setup()
    exp = VAEXperiment(
        model, {"LR": 0.0005, "scheduler_gamma": 1.0,
                "kld_weight": 0.00025}, data)
    exp.setup(next(iter(data.train_dataloader(0))), seed=SEED)
    accs, nodirs = [], []
    for epoch in range(EPOCHS):
        exp.train_epoch(epoch)
        val = exp.validate(epoch)
        accs.append(val["val_causal_acc"])
        nodirs.append(val["val_causal_nodir_acc"])
    acc, nodir = _last5_mean(accs, nodirs)
    assert acc >= ACC_THRESHOLD, (acc, accs)
    assert nodir >= NODIR_THRESHOLD, (nodir, nodirs)
