#!/usr/bin/env python
"""Train ctvae_tpu's CT-MCQ-VAE on TSynthetic and emit the SAME JSON
schema as scripts/reference_causal_train.py — the jax half of the
end-task causal comparison (PARITY.md "End-task causal comparison").

Runs on whatever backend JAX_PLATFORMS selects (the real chip under the
default axon env). The round-4 recipe enlarges the causal val split to
1,104 evaluated samples (factor grid 6,6,4,5, split cuts 0.6,0.72 —
the archived runs in assets/causal_r4/) so the reported causal_acc has
a binomial 95% CI half-width <=0.03 — the round-3 table's 176-sample
quantum dominated its seed spread.

    python scripts/jax_causal_train.py --epochs 60 --seed 1265 \
        --factor-sizes 6,6,4,5 --split-cuts 0.6,0.72 --out jax1265.json

Round-5 adds the reference's documented TWO-STAGE recipe
(--pretrain-epochs N > 0): pretrain an MCQVAE backbone on the same
image stream, weights-only restore into CTMCQVAE, freeze everything
but ct_layer (update_parameters semantics,
/root/reference/run.py:85-89 + configs/ct_mcq_vae.yaml:37-38), then
train. --pretrain-epochs 0 (default) keeps the joint recipe.
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
    ap.add_argument("--pretrain-epochs", type=int, default=0,
                    help="> 0: two-stage recipe — pretrain MCQVAE for N "
                         "epochs, weights-only restore into CTMCQVAE, "
                         "then train ct_layer ONLY (reference "
                         "run.py:85-89 + ct_mcq_vae.yaml:37-38)")
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
    exp_params = {"LR": args.lr, "weight_decay": 0.0,
                  "scheduler_gamma": args.scheduler_gamma,
                  "kld_weight": args.kld_weight,
                  "manual_seed": args.seed}
    first = next(iter(data.train_dataloader(0)))

    pre_traj = []
    ckpt_path = ""
    if args.pretrain_epochs > 0:
        # stage 1: reconstruction-only MCQVAE pretrain on the same
        # image stream; checkpoint to disk (the weights-only restore
        # below goes through the real checkpoint path on purpose)
        import tempfile
        from ctvae_tpu.utils.checkpoint import CheckpointManager
        mp1 = {k: v for k, v in mp.items()
               if k not in ("name", "action_dim", "causal_hidden_dims",
                            "gamma")}
        mp1["name"] = "MCQVAE"
        exp1 = VAEXperiment(build_model(mp1), dict(exp_params), data)
        exp1.setup(first, seed=args.seed)
        for epoch in range(args.pretrain_epochs):
            te = time.time()
            tm = exp1.train_epoch(epoch)
            rec = {"pretrain_epoch": epoch,
                   "recon_loss": round(tm.get("Reconstruction_Loss",
                                              float("nan")), 6),
                   "epoch_sec": round(time.time() - te, 1)}
            pre_traj.append(rec)
            print(json.dumps(rec), flush=True)
            if args.progress:
                with open(args.progress, "a") as f:
                    f.write(json.dumps(rec) + "\n")
        ckpt_dir = tempfile.mkdtemp(prefix="mcq_pretrain_")
        cm = CheckpointManager(ckpt_dir, async_save=False)
        cm.save(exp1.state, exp1.global_step)
        ckpt_path = os.path.join(ckpt_dir, "last")
        del exp1

    exp = VAEXperiment(
        build_model(mp),
        dict(exp_params, **({"update_parameters": "ct_layer"}
                            if args.pretrain_epochs > 0 else {})),
        data)
    exp.setup(first, seed=args.seed)
    if args.pretrain_epochs > 0:
        # stage 2: weights-only restore (encoder/vq_layer/decoder land,
        # ct_layer keeps its fresh init) + ct_layer-only optimizer via
        # update_parameters (optax.masked) — run.py:85-89 semantics
        exp.load_weights(ckpt_path)

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
        "recipe": ("two_stage" if args.pretrain_epochs > 0 else "joint"),
        "pretrain_epochs": args.pretrain_epochs,
        "pretrain_trajectory": pre_traj,
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
