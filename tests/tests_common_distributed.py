"""Shared training routine for the multi-process distributed test: the
same code runs inside each distributed worker AND in the single-process
comparison, so any loss difference is the distribution layer's fault."""

from __future__ import annotations

SEED = 13
MODEL = dict(name="CTMCQVAE", in_channels=3, embedding_dim=8,
             action_dim=8, num_embeddings=8, hidden_dims=[8, 16],
             img_size=16, codebooks=2, causal_hidden_dims=[16, 8],
             gamma=1.5)
STEPS = 6


def run_training(local_batch_size: int):
    """Train STEPS real steps; returns [(mode, loss), ...].

    ``local_batch_size`` is the per-host slice; the global batch is
    ``local_batch_size * jax.process_count()`` — identical global
    composition whether run as 1 process x 8 devices or 2 x 4
    (TransitionBatchScheduler slices one seeded global schedule).
    """
    import jax

    from ctvae_tpu.data import VAEDataset
    from ctvae_tpu.models import build_model
    from ctvae_tpu.training import VAEXperiment

    model = build_model(dict(MODEL))
    data = VAEDataset(data_path="", dataset_name="TSynthetic",
                      train_batch_size=local_batch_size,
                      val_batch_size=local_batch_size, patch_size=16,
                      n=96, limit=16, val_limit=8, seed=SEED)
    data.setup()
    exp = VAEXperiment(model, {"LR": 1e-3, "kld_weight": 0.005}, data)
    first = next(iter(data.train_dataloader(0)))
    exp.setup(first, seed=SEED)

    from ctvae_tpu.data.prefetch import prefetch_to_device
    multiproc = jax.process_count() > 1
    if multiproc:
        from jax.experimental import multihost_utils
    records = []
    compiled = {}
    it = prefetch_to_device(data.train_dataloader(0), exp.mesh)
    for batch in it:
        if len(records) >= STEPS:
            break
        mode = batch.pop("mode", "base")
        step = exp._train_step(mode, 0)
        if multiproc:
            # Compile BEFORE the first execution and barrier on it: a
            # worker that reaches a gloo rendezvous while its peer is
            # still compiling times the context creation out (30s);
            # AOT-compile + sync keeps all collective executions in
            # near-lockstep. (Compile itself has no collectives.)
            if mode not in compiled:
                compiled[mode] = step.lower(exp.state, batch).compile()
                multihost_utils.sync_global_devices(f"compiled-{mode}")
            step = compiled[mode]
        exp.state, metrics = step(exp.state, batch)
        records.append((mode, float(jax.device_get(metrics["loss"]))))
    return records
