#!/usr/bin/env python
"""Train ctvae_tpu's CT-MCQ-VAE on TSynthetic and emit the SAME JSON
schema as scripts/reference_causal_train.py — the jax half of the
end-task causal comparison (PARITY.md "End-task causal comparison").

Runs on whatever backend JAX_PLATFORMS selects (the real chip under the
default axon env). The round-4 recipe enlarges the causal val split to
1,178 samples (factor grid 6,6,4,5, split cuts 0.55,0.85) so the
reported causal_acc has a binomial 95% CI half-width <=0.03 — the
round-3 table's 176-sample quantum dominated its seed spread.

    python scripts/jax_causal_train.py --epochs 60 --seed 1265 \
        --factor-sizes 6,6,4,5 --split-cuts 0.55,0.85 --out jax1265.json
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.append(REPO)


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
    ap.add_argument("--split-cuts", default="0.7,0.85")
    ap.add_argument("--out", default="")
    ap.add_argument("--progress", default="")
    args = ap.parse_args()

    split_cuts = tuple(float(v) for v in args.split_cuts.split(","))
    factor_sizes = tuple(int(v) for v in args.factor_sizes.split(","))
    action_dim = 2 * len(factor_sizes)
    mp = dict(name="CTMCQVAE", in_channels=3, embedding_dim=8,
              action_dim=action_dim, hidden_dims=[8, 16],
              num_embeddings=8, img_size=args.img, codebooks=2,
              causal_hidden_dims=[16, 8], gamma=1.5)

    from ctvae_tpu.data import VAEDataset
    from ctvae_tpu.models import build_model
    from ctvae_tpu.training import VAEXperiment

    data = VAEDataset("", dataset_name="TSynthetic",
                      train_batch_size=args.batch,
                      val_batch_size=args.batch, patch_size=args.img,
                      distributed=False, seed=args.seed,
                      factor_sizes=factor_sizes, split_cuts=split_cuts)
    data.setup()
    exp = VAEXperiment(build_model(mp),
                       {"LR": args.lr, "weight_decay": 0.0,
                        "scheduler_gamma": args.scheduler_gamma,
                        "kld_weight": args.kld_weight,
                        "manual_seed": args.seed},
                       data)
    first = next(iter(data.train_dataloader(0)))
    exp.setup(first, seed=args.seed)

    traj = []
    t0 = time.time()
    for epoch in range(args.epochs):
        te = time.time()
        tm = exp.train_epoch(epoch)
        val = exp.validate(epoch)
        rec = {"epoch": epoch,
               "causal_acc": round(val.get("val_causal_acc",
                                           float("nan")), 4),
               "causal_nodir_acc": round(val.get("val_causal_nodir_acc",
                                                 float("nan")), 4),
               "train_img_per_sec": round(tm["images_per_sec"], 1),
               "epoch_sec": round(time.time() - te, 1)}
        traj.append(rec)
        line = json.dumps(rec)
        print(line, flush=True)
        if args.progress:
            with open(args.progress, "a") as f:
                f.write(line + "\n")

    result = {
        "framework": "ctvae_tpu",
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
