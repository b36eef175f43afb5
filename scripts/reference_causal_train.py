#!/usr/bin/env python
"""Train the TORCH REFERENCE CT-MCQ-VAE end-to-end on TSynthetic and
report its end-task causal accuracy — the side-by-side the step-level
parity tests cannot give (round-2 VERDICT item 3).

The reference never shipped numbers for its headline metric
(`causal_acc` / `causal_nodir_acc`, /root/reference/models/
ct_mcq_vae.py:325-333; measurement loop in apply_action.ipynb cell 7).
This driver runs the reference's own model + optimizer recipe
(/root/reference/experiment.py:152-187: Adam + per-epoch ExponentialLR,
M_N=kld_weight in training, M_N=1.0 in validation) on the EXACT batch
stream ctvae_tpu's TSynthetic datamodule produces (same seed -> same
images, actions, mode schedule), so the only variable is the framework.

The GATv2 layer comes from tests/pyg_fixture.py (the faithful PyG 2.x
port used by all reference-parity tests; the torch-geometric CUDA wheel
is not installable here) and torchvision is stubbed — both via
tests/_pyg_install.py, exactly as the e2e trajectory drivers do.

Emits one JSON line: per-epoch val causal_acc / causal_nodir_acc
trajectories plus the final values; optionally appends per-epoch JSONL
progress to --progress for long-run monitoring.

Full-scale run (matches PARITY.md's ctvae_tpu recipe — synthetic_ct.yaml
shapes, batch 16, LR 5e-4, scheduler_gamma 1.0, 60 epochs):
    python scripts/reference_causal_train.py --epochs 60 --out ref.json
Smoke scale (CI): --epochs N --factor-sizes 3,3,2 --batch 8
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
from _pyg_install import (install_torch_geometric,  # noqa: E402
                          install_torchvision_stub)

install_torchvision_stub()
install_torch_geometric()
sys.path.insert(0, "/root/reference")
sys.path.append(REPO)

import torch  # noqa: E402


def build_reference_model(mp):
    import importlib
    ref_mod = importlib.import_module("models.ct_mcq_vae")
    return ref_mod.CTMCQVAE(
        in_channels=int(mp["in_channels"]),
        embedding_dim=int(mp["embedding_dim"]),
        action_dim=int(mp["action_dim"]),
        num_embeddings=int(mp["num_embeddings"]),
        hidden_dims=list(mp["hidden_dims"]),
        causal_hidden_dims=list(mp["causal_hidden_dims"]),
        gamma=float(mp["gamma"]),
        img_size=int(mp["img_size"]),
        codebooks=int(mp["codebooks"]))


def _nchw(x):
    return torch.from_numpy(np.moveaxis(np.asarray(x, np.float32),
                                        -1, 1).copy())


def _fwd_kwargs(batch):
    kw = {}
    if "input_y" in batch:
        kw["input_y"] = _nchw(batch["input_y"])
    if "action" in batch:
        kw["action"] = torch.from_numpy(
            np.asarray(batch["action"], np.float32))
    return kw


def evaluate(model, data, epoch):
    """Average the causal metrics over the val split's causal batches
    (M_N=1.0, reference experiment.py:67-71)."""
    model.eval()
    accs, nodirs, n = [], [], 0
    with torch.no_grad():
        for batch in data.val_dataloader(epoch):
            if batch["mode"] != "causal":
                continue
            out = model.forward(_nchw(batch["image"]), mode="causal",
                                **_fwd_kwargs(batch))
            losses = model.loss_function(*out, M_N=1.0)
            accs.append(float(losses["causal_acc"]))
            nodirs.append(float(losses["causal_nodir_acc"]))
            n += 1
    model.train()
    return (float(np.mean(accs)) if n else float("nan"),
            float(np.mean(nodirs)) if n else float("nan"), n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=0.0005)
    ap.add_argument("--scheduler-gamma", type=float, default=1.0)
    ap.add_argument("--kld-weight", type=float, default=0.00025)
    ap.add_argument("--seed", type=int, default=1265)
    ap.add_argument("--img", type=int, default=16)
    ap.add_argument("--factor-sizes", default="5,5,3,4")
    ap.add_argument("--split-cuts", default="0.7,0.85",
                    help="train/valid/test grid boundaries; the round-4 "
                         "comparison uses 6,6,4,5 + 0.55,0.85 for a "
                         "1,178-sample causal val split (CI half-width "
                         "<=0.03)")
    ap.add_argument("--out", default="")
    ap.add_argument("--progress", default="")
    args = ap.parse_args()

    split_cuts = tuple(float(v) for v in args.split_cuts.split(","))
    factor_sizes = tuple(int(v) for v in args.factor_sizes.split(","))
    action_dim = 2 * len(factor_sizes)
    # synthetic_ct.yaml model shapes (action_dim tracks the factor count)
    mp = dict(in_channels=3, embedding_dim=8, action_dim=action_dim,
              hidden_dims=[8, 16], num_embeddings=8, img_size=args.img,
              codebooks=2, causal_hidden_dims=[16, 8], gamma=1.5)

    from ctvae_tpu.data.datamodule import VAEDataset
    data = VAEDataset("", dataset_name="TSynthetic",
                      train_batch_size=args.batch,
                      val_batch_size=args.batch, patch_size=args.img,
                      distributed=False, seed=args.seed,
                      factor_sizes=factor_sizes, split_cuts=split_cuts)
    data.setup()

    torch.manual_seed(args.seed)
    np.random.seed(args.seed)
    model = build_reference_model(mp)
    opt = torch.optim.Adam(model.parameters(), lr=args.lr,
                           weight_decay=0.0)
    sched = torch.optim.lr_scheduler.ExponentialLR(
        opt, gamma=args.scheduler_gamma)

    traj = []
    t0 = time.time()
    model.train()
    for epoch in range(args.epochs):
        te = time.time()
        steps = 0
        for batch in data.train_dataloader(epoch):
            out = model.forward(_nchw(batch["image"]),
                                mode=batch["mode"], **_fwd_kwargs(batch))
            losses = model.loss_function(*out, M_N=args.kld_weight)
            opt.zero_grad()
            losses["loss"].backward()
            opt.step()
            steps += 1
        sched.step()
        acc, nodir, nb = evaluate(model, data, epoch)
        rec = {"epoch": epoch, "causal_acc": round(acc, 4),
               "causal_nodir_acc": round(nodir, 4), "val_batches": nb,
               "train_steps": steps,
               "epoch_sec": round(time.time() - te, 1)}
        traj.append(rec)
        line = json.dumps(rec)
        print(line, flush=True)
        if args.progress:
            with open(args.progress, "a") as f:
                f.write(line + "\n")

    result = {
        "framework": "torch-reference",
        "epochs": args.epochs, "batch": args.batch, "lr": args.lr,
        "scheduler_gamma": args.scheduler_gamma,
        "factor_sizes": list(factor_sizes),
        "split_cuts": list(split_cuts),
        "seed": args.seed,
        "chance_acc": 1.0 / action_dim,
        "chance_nodir_acc": 2.0 / action_dim,
        "final_causal_acc": traj[-1]["causal_acc"],
        "final_causal_nodir_acc": traj[-1]["causal_nodir_acc"],
        "best_causal_acc": max(t["causal_acc"] for t in traj),
        "best_causal_nodir_acc": max(t["causal_nodir_acc"] for t in traj),
        "total_sec": round(time.time() - t0, 1),
        "trajectory": traj,
    }
    out = json.dumps(result)
    print(out, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
