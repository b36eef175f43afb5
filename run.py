#!/usr/bin/env python
"""Training entry point — ``python run.py -c configs/<x>.yaml``.

Drop-in compatible with the reference CLI (/root/reference/run.py:21-110):
the YAML schema is identical (``model_params`` / ``data_params`` /
``exp_params`` / ``trainer_params`` / ``logging_params``); torch/
Lightning-only knobs (``gpus``, ``num_workers``, ``pin_memory``,
``find_unused_parameters``, ``retain_first_backpass``) are accepted and
ignored — device placement is the SPMD mesh over every visible chip, and
partial-parameter updates are optimizer masks, which need no DDP flags.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import yaml


def main():
    parser = argparse.ArgumentParser(description="Generic runner for VAE models")
    parser.add_argument("--config", "-c", dest="filename", metavar="FILE",
                        help="path to the config file",
                        default="configs/vae.yaml")
    args = parser.parse_args()

    with open(args.filename) as f:
        config = yaml.safe_load(f)

    # Imports after arg parsing so `-h` is instant.
    import jax

    # JAX_PLATFORMS must be authoritative even on hosts whose
    # sitecustomize pre-registers an accelerator PJRT plugin (env alone
    # does not override it; jax.config does). Keeps the CLI hermetic
    # under JAX_PLATFORMS=cpu in CI.
    from ctvae_tpu.utils.platform import apply_platform_overrides
    apply_platform_overrides()

    # Multi-host SPMD (TPU pods): one process per host, same invocation
    # everywhere; JAX wires the mesh over ICI/DCN. Opt-in by env because
    # initialize() blocks waiting for peers.
    if os.environ.get("CTVAE_MULTIHOST", "0") == "1":
        jax.distributed.initialize()

    from ctvae_tpu.data import VAEDataset
    from ctvae_tpu.metrics import MetricSet
    from ctvae_tpu.models import build_model
    from ctvae_tpu.training import VAEXperiment, install_preemption_handler
    from ctvae_tpu.utils import CheckpointManager, ExperimentLogger

    # copies: the knob routing below must not mutate the config dict the
    # logger records as hparams
    exp_params = dict(config.get("exp_params", {}))
    trainer_params = dict(config.get("trainer_params", {}))
    logging_params = config.get("logging_params", {})
    model_params = config.get("model_params", {})
    data_params = dict(config.get("data_params", {}))

    # gradient_clip_val is a PL *Trainer* knob in the reference YAMLs
    # (configs/gammavae.yaml:22, infovae.yaml) — route it to the
    # optimizer chain, which owns clipping here.
    if "gradient_clip_val" in trainer_params:
        exp_params.setdefault("gradient_clip_val",
                              trainer_params.pop("gradient_clip_val"))
    # accumulate_grad_batches is likewise a PL Trainer knob: k microbatch
    # grads are averaged before one optimizer step (optax.MultiSteps).
    if "accumulate_grad_batches" in trainer_params:
        exp_params.setdefault("accumulate_grad_batches",
                              trainer_params.pop("accumulate_grad_batches"))

    # exp_params.sharding: "sp" — sequence parallelism: the CT model's
    # O(S^2) attention/pairwise domains shard over the mesh's `model`
    # axis (ctvae_tpu/parallel/mesh.py shard_dim). The model needs
    # seq_axis="model" at construction; build_model drops the key for
    # models without the field (they have no sequence axis to shard).
    if str(exp_params.get("sharding", "")).lower() == "sp":
        model_params = dict(model_params)
        model_params.setdefault("seq_axis", "model")

    seed = int(exp_params.get("manual_seed", 1265))
    np.random.seed(seed)

    logger = ExperimentLogger(
        save_dir=logging_params.get("save_dir", "logs/"),
        name=logging_params.get("name", model_params.get("name", "model")),
        use_wandb=bool(logging_params.get("use_wandb", False)),
        hparams=config)
    print(f"=> logging to {logger.log_dir}")

    model = build_model(model_params)

    data_params.setdefault("seed", seed)
    data = VAEDataset(**data_params)
    data.setup()

    # Disentanglement metrics over the *raw factor* dataset, like the
    # reference passes val_dataset._full_data (/root/reference/run.py:66-76).
    metric_names = exp_params.get("metrics")
    val_metrics = None
    if metric_names:
        full = getattr(data.val_dataset, "_full_data", data.val_dataset)
        # sampling sizes follow the reference wiring: 20/10 train batches
        # worth of representation samples (/root/reference/run.py:72-76)
        tbs = int(data_params.get("train_batch_size", 64))
        val_metrics = MetricSet(metric_names, full,
                                batch_size=int(data_params.get(
                                    "val_batch_size", 64)),
                                num_train=tbs * 20, num_test=tbs * 10)

    ckpt_dir = os.path.join(logger.log_dir, "checkpoints")
    ckpt = CheckpointManager(
        ckpt_dir, top_k=2, monitor="val_Reconstruction_Loss",
        # overlap checkpoint writes with the next epoch's compute
        async_save=bool(exp_params.get("async_checkpointing", False)))

    experiment = VAEXperiment(model, exp_params, data, logger=logger,
                              ckpt_manager=ckpt, val_metrics=val_metrics)
    # preemptible TPU VMs get SIGTERM before eviction: checkpoint + exit
    # cleanly, resumable via trainer_params.resume_from_checkpoint
    install_preemption_handler(experiment)

    for sub in ("Inputs", "Samples", "Reconstructions"):
        os.makedirs(os.path.join(logger.log_dir, sub), exist_ok=True)

    first = next(iter(data.train_dataloader(0)))
    experiment.setup(first, seed=seed)

    resume = trainer_params.pop("resume_from_checkpoint", None)
    weights_only = trainer_params.pop("load_weights_only", False)
    if resume:
        if weights_only:
            experiment.load_weights(resume)
            print(f"=> loaded weights (only) from {resume}")
        else:
            experiment.restore_full_state(resume)
            print(f"=> resumed full state from {resume} "
                  f"(step {experiment.global_step}, "
                  f"epoch {experiment.start_epoch})")

    max_epochs = int(trainer_params.get("max_epochs", 100))
    print(f"======= Training {model_params.get('name')} "
          f"on {len(jax.devices())} device(s) =======")
    try:
        final = experiment.fit(max_epochs, seed=seed,
                               sample_dir=logger.log_dir)
    except Exception as e:
        from ctvae_tpu.utils.watchdog import (StepHangError,
                                              incident_log_path)
        if isinstance(e, StepHangError):
            # exp_params.hang_watchdog tripped: the chip is wedged and
            # unrecoverable in-process. Exit 75 (EX_TEMPFAIL) so a
            # supervisor restarts from the last orbax checkpoint —
            # typically with CTVAE_FLASH_GAT=0 to pin the XLA path.
            print(f"=> step hang detected ({e}); incident appended to "
                  f"{incident_log_path()}. Restart with "
                  f"trainer_params.resume_from_checkpoint (last) — set "
                  f"CTVAE_FLASH_GAT=0 to pin the XLA attention path.",
                  file=sys.stderr)
            sys.exit(75)
        raise
    logger.finish()
    print({k: round(v, 5) for k, v in final.items()
           if isinstance(v, float)})


if __name__ == "__main__":
    main()
