#!/usr/bin/env python
"""Hyperparameter search — ``python hyperparameter_search.py -c configs_hyp/<x>.yaml``.

Same YAML schema as the reference (/root/reference/hyperparameter_search.py:34-47):
the ``hyperparameter_search.params`` tree names which config keys are
search dimensions, with the reference's exact ``to_tune`` leaf rules —
**list values become categorical choices, tuple values become uniform
ranges** (tuples are written ``!!python/tuple [lo, hi]`` in YAML and
read via ``yaml.full_load``, exactly like the reference). The spec tree
mirrors ``to_tune``'s recursion: a dict maps section names to nested
specs, a list names keys within the current section.

The reference delegates trial scheduling to Ray Tune actors
(:89-99, one GPU per trial). Ray is not a dependency here; instead
trials run either sequentially on the local mesh (default — on a TPU
chip trials contend for the same device, so sequential is the right
unit) or as ``hyperparameter_search.parallel_trials: N`` concurrent
processes (CPU sweeps). The objective is the best
``val_Reconstruction_Loss`` — the same scalar Ray's
``TuneReportCallback`` monitors (:82-84). ``resources_per_trial`` is
accepted and ignored (Ray-only knob).

Early stopping: ``hyperparameter_search.scheduler: asha`` enables
successive halving with Ray Tune ``ASHAScheduler``'s knob names —
``grace_period`` (epochs every trial gets, default 1) and
``reduction_factor`` (η, default 2 — Ray's own default is 4; see
MIGRATION.md). Every trial trains to the first rung's budget; the best
``1/η`` continue to an ``η``-times-larger budget, and so on until
``trainer_params.max_epochs``. With the default single process, trials
pause in-process (their train state stays live) and resume exactly
where they stopped, so no epoch is retrained; culled trials are evicted
so held memory tracks the survivors, not ``num_samples``. With
``parallel_trials: N`` (CPU sweeps), each rung's trials run as N
concurrent spawned processes and cross-rung state rides the orbax
checkpoint path — still no epoch retrained, at the cost of per-rung
process startup + checkpoint IO.
"""

from __future__ import annotations

import argparse
import copy
import json
import math
import os
import random
from typing import Any, Dict

import yaml


def sample_params(config: Dict[str, Any], spec: Any,
                  rng: random.Random) -> Dict[str, Any]:
    """One trial config drawn from the search space.

    Mirrors the reference ``to_tune`` recursion
    (/root/reference/hyperparameter_search.py:35-47): ``spec`` dicts
    recurse into config sections, ``spec`` lists name keys of the
    current section; at each named leaf a list value -> ``rng.choice``,
    a tuple value -> ``rng.uniform(lo, hi)``.
    """
    trial = copy.deepcopy(config)

    def walk(spec_node, cfg_node):
        if isinstance(spec_node, dict):
            for key, nested in spec_node.items():
                if key in cfg_node:  # missing keys skipped, as in the
                    cfg_node[key] = walk(nested, cfg_node[key])  # reference
        elif isinstance(spec_node, list):
            for key in spec_node:
                if key in cfg_node:
                    cfg_node[key] = walk(None, cfg_node[key])
        else:  # leaf: convert the config value itself
            if isinstance(cfg_node, tuple):
                return rng.uniform(cfg_node[0], cfg_node[1])
            if isinstance(cfg_node, list):
                return rng.choice(cfg_node)
        return cfg_node

    return walk(spec, trial)


def select_best(results):
    """Best trial by lowest ``val_Reconstruction_Loss``. Missing or
    non-finite losses never win (NaN compares False against everything,
    so it must be screened explicitly, not relied on to lose)."""
    best = None
    for entry in results:
        loss = entry["loss"]
        if not math.isfinite(loss):
            continue
        if best is None or loss < best["loss"]:
            best = entry
    return best if best is not None else (results[0] if results else None)


def run_sha(num_trials: int, grace_period: int, reduction_factor: int,
            max_t: int, train_to, rung_runner=None, on_cull=None) -> list:
    """Synchronous successive halving over ``num_trials`` trials.

    ``train_to(trial_id, target_epochs) -> float | None`` continues the
    trial's training up to ``target_epochs`` total epochs and returns
    its current objective (lower is better), or None on failure. Rung
    budgets are ``grace_period * reduction_factor**i`` epochs, capped at
    ``max_t``; after each rung only the best ``1/reduction_factor``
    survive (at least one). Failed trials are culled immediately.
    Returns the trial ids alive after the final rung, best first.

    ``rung_runner(tids, budget) -> list[(tid, loss | None)]``, when
    given, evaluates a whole rung at once (rung-parallel CPU sweeps);
    otherwise trials run via ``train_to`` one by one. ``on_cull(tids)``
    is called with every trial id dropped at a rung boundary (losers and
    crashes) so the caller can release the trial's resources — live
    device state held for culled trials scales memory with num_samples
    otherwise.

    This is the synchronous-rung analogue of Ray Tune's ``ASHAScheduler``
    (arXiv:1810.05934) — synchronous because local trials either share
    one device or advance in lock-step pools, so there is no straggler
    problem for ASHA's asynchronous promotion rule to solve.
    """
    eta = max(2, int(reduction_factor))
    budget = max(1, int(grace_period))
    max_t = max(1, int(max_t))
    alive = list(range(num_trials))
    while True:
        budget = min(budget, max_t)
        if rung_runner is not None:
            outcomes = list(rung_runner(list(alive), budget))
        else:
            outcomes = [(tid, train_to(tid, budget)) for tid in alive]
        scores = []
        for tid, loss in outcomes:
            if loss is None:
                continue  # crashed trial: cull
            scores.append((loss if math.isfinite(loss) else float("inf"),
                           tid))
        scores.sort(key=lambda s: s[0])
        if budget >= max_t:
            if on_cull:
                on_cull(list(alive))  # sweep over: free every live trial
            return [tid for _, tid in scores]
        if not scores:
            return []
        survivors = [tid for _, tid in scores[:max(1, len(scores) // eta)]]
        if on_cull:
            culled = [tid for tid in alive if tid not in survivors]
            if culled:
                on_cull(culled)
        alive = survivors
        budget *= eta


def run_trial(trial_config: Dict[str, Any], trial_id: int,
              out_dir: str) -> Dict[str, float]:
    from ctvae_tpu.utils.platform import apply_platform_overrides
    apply_platform_overrides()

    from ctvae_tpu.data import VAEDataset
    from ctvae_tpu.models import build_model
    from ctvae_tpu.training import VAEXperiment

    model = build_model(trial_config["model_params"])
    data = VAEDataset(**trial_config["data_params"])
    data.setup()
    # route the PL Trainer-level clip knob to the optimizer chain, like
    # run.py does
    exp_params = dict(trial_config["exp_params"])
    gcv = trial_config["trainer_params"].get("gradient_clip_val")
    if gcv is not None:
        exp_params.setdefault("gradient_clip_val", gcv)
    exp = VAEXperiment(model, exp_params, data)
    max_epochs = int(trial_config["trainer_params"].get("max_epochs", 10))
    final = exp.fit(max_epochs,
                    seed=int(trial_config["exp_params"].get(
                        "manual_seed", 0)) + trial_id)
    return {k: float(v) for k, v in final.items()}


def continue_trial(trial_config: Dict[str, Any], trial_id: int,
                   target_epochs: int, cache: Dict[int, Any]):
    """Train trial ``trial_id`` up to ``target_epochs`` TOTAL epochs,
    resuming the cached live experiment from where the previous rung
    paused it (no epoch is retrained). Returns the final val metrics."""
    from ctvae_tpu.utils.platform import apply_platform_overrides
    apply_platform_overrides()

    from ctvae_tpu.data import VAEDataset
    from ctvae_tpu.models import build_model
    from ctvae_tpu.training import VAEXperiment

    if trial_id not in cache:
        model = build_model(trial_config["model_params"])
        data = VAEDataset(**trial_config["data_params"])
        data.setup()
        exp_params = dict(trial_config["exp_params"])
        gcv = trial_config["trainer_params"].get("gradient_clip_val")
        if gcv is not None:
            exp_params.setdefault("gradient_clip_val", gcv)
        cache[trial_id] = [VAEXperiment(model, exp_params, data), 0, {}]
    exp, epochs_done, last = cache[trial_id]
    if target_epochs <= epochs_done:
        return last  # rung budget already reached (grace >= max_t)
    exp.start_epoch = epochs_done
    final = exp.fit(target_epochs,
                    seed=int(trial_config["exp_params"].get(
                        "manual_seed", 0)) + trial_id)
    metrics = {k: float(v) for k, v in final.items()}
    cache[trial_id][1] = target_epochs
    cache[trial_id][2] = metrics
    return metrics


def _trial_entry(args):
    """Top-level worker for parallel trials (must be picklable)."""
    trial, trial_id, out_dir = args
    try:
        return trial_id, run_trial(trial, trial_id, out_dir), None
    except Exception as e:  # a bad draw must not kill the sweep
        return trial_id, None, repr(e)


def _rung_entry(args):
    """Top-level worker for rung-parallel ASHA (must be picklable).

    Processes cannot pause in-memory between rungs, so cross-rung state
    rides the production orbax checkpoint path instead: each rung's
    worker restores the trial's ``last`` checkpoint (written by
    ``fit``'s per-epoch save) and trains on to the rung budget — no
    epoch is retrained, same contract as the in-process cache."""
    trial_config, trial_id, target_epochs, ckpt_dir = args
    try:
        from ctvae_tpu.utils.platform import apply_platform_overrides
        apply_platform_overrides()

        from ctvae_tpu.data import VAEDataset
        from ctvae_tpu.models import build_model
        from ctvae_tpu.training import VAEXperiment
        from ctvae_tpu.utils import CheckpointManager

        model = build_model(trial_config["model_params"])
        data = VAEDataset(**trial_config["data_params"])
        data.setup()
        exp_params = dict(trial_config["exp_params"])
        gcv = trial_config["trainer_params"].get("gradient_clip_val")
        if gcv is not None:
            exp_params.setdefault("gradient_clip_val", gcv)
        ckpt = CheckpointManager(ckpt_dir, top_k=1,
                                 monitor="val_Reconstruction_Loss")
        exp = VAEXperiment(model, exp_params, data, ckpt_manager=ckpt)
        seed = int(trial_config["exp_params"].get("manual_seed", 0))
        first = next(iter(data.train_dataloader(0)))
        exp.setup(first, seed=seed + trial_id)
        if os.path.exists(os.path.join(ckpt_dir, "last")):
            exp.restore_full_state("last")
        if exp.start_epoch >= target_epochs:
            # rung budget already reached (grace >= max_t): report the
            # checkpointed objective by re-running validation
            metrics = exp.validate(exp.start_epoch)
        else:
            metrics = exp.fit(target_epochs, seed=seed + trial_id)
        return trial_id, {k: float(v) for k, v in metrics.items()}, None
    except Exception as e:
        return trial_id, None, repr(e)


def _searched(trial, spec):
    """Flatten the searched dimensions of one trial for reporting."""
    out = {}

    def walk(spec_node, cfg_node, prefix):
        if isinstance(spec_node, dict):
            for key, nested in spec_node.items():
                walk(nested, cfg_node[key], prefix + (key,))
        elif isinstance(spec_node, list):
            for key in spec_node:
                out[".".join(prefix + (key,))] = cfg_node[key]
        else:
            out[".".join(prefix)] = cfg_node

    walk(spec, trial, ())
    return out


def main():
    parser = argparse.ArgumentParser(
        description="Hyperparameter search runner for VAE models")
    parser.add_argument("--config", "-c", dest="filename", metavar="FILE",
                        default="configs_hyp/ct_mcq_vae_hyp_search.yaml")
    args = parser.parse_args()

    with open(args.filename) as f:
        # full_load: !!python/tuple [lo, hi] leaves parse as tuples ->
        # uniform ranges, matching the reference's yaml.full_load (:27)
        config = yaml.full_load(f)

    hyp = config.pop("hyperparameter_search")
    num_samples = int(hyp.get("num_samples", 10))
    spec = hyp.get("params", {})
    parallel = int(hyp.get("parallel_trials", 1))
    seed = int(config.get("exp_params", {}).get("manual_seed", 0))
    rng = random.Random(seed)

    save_dir = config.get("logging_params", {}).get("save_dir", "logs/")
    name = config.get("model_params", {}).get("name", "model")
    out_dir = os.path.join(save_dir, name, "hyp_search")
    os.makedirs(out_dir, exist_ok=True)

    trials = [sample_params(config, spec, rng) for _ in range(num_samples)]
    for tid, trial in enumerate(trials):
        print(f"--- trial {tid}/{num_samples}: {_searched(trial, spec)}")

    results = []

    def _write_results():
        best = select_best(results)
        with open(os.path.join(out_dir, "results.json"), "w") as f:
            json.dump({"best": best, "trials": results}, f, indent=2,
                      default=str)
        return best

    def record(trial_id, metrics, err):
        if err is not None:
            print(f"    trial {trial_id} failed: {err}")
            # a trial that cleared an earlier rung then crashed must not
            # stay competitive through its stale entry: flag it failed
            # and push it out of best-selection
            for r in results:
                if r["trial"] == trial_id:
                    r["loss"] = float("inf")
                    r["failed"] = err
            _write_results()
            return
        loss = metrics.get("val_Reconstruction_Loss", float("inf"))
        # a trial reports once per rung under the asha scheduler — keep
        # only its latest entry
        results[:] = [r for r in results if r["trial"] != trial_id]
        results.append({"trial": trial_id, "loss": loss,
                        "metrics": metrics,
                        "params": _searched(trials[trial_id], spec)})
        best = _write_results()
        print(f"    trial {trial_id}: val_Reconstruction_Loss={loss:.5f} "
              f"(best={best['loss']:.5f} @ trial {best['trial']})")

    scheduler = str(hyp.get("scheduler", "fifo")).lower()
    if scheduler in ("asha", "sha", "successive_halving"):
        grace = int(hyp.get("grace_period", 1))
        # NOTE the default η here is 2; Ray Tune's ASHAScheduler defaults
        # to 4 — ported configs relying on Ray's default must set
        # reduction_factor: 4 explicitly (documented in MIGRATION.md).
        eta = int(hyp.get("reduction_factor", 2))
        if eta < 2:
            raise ValueError(
                f"hyperparameter_search.reduction_factor must be >= 2 "
                f"(got {eta}): successive halving keeps 1/η of each rung, "
                f"which degenerates at η < 2")
        max_t = int(config.get("trainer_params", {}).get("max_epochs", 10))
        rung_runner = None
        train_to = None
        if parallel > 1:
            # rung-parallel CPU sweeps: each rung's surviving trials run
            # as N concurrent spawned processes; cross-rung state rides
            # the orbax checkpoint path (see _rung_entry)
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor
            ctx = mp.get_context("spawn")
            print(f"--- scheduler: {scheduler} with rung-parallel "
                  f"evaluation ({parallel} processes; trials resume from "
                  "checkpoints at each rung)")

            def rung_runner(tids, budget):
                outcomes = []
                with ProcessPoolExecutor(max_workers=parallel,
                                         mp_context=ctx) as pool:
                    for tid, metrics, err in pool.map(
                            _rung_entry,
                            [(trials[t], t, budget,
                              os.path.join(out_dir, f"trial_{t}",
                                           "checkpoints"))
                             for t in tids]):
                        record(tid, metrics, err)
                        loss = None if metrics is None else metrics.get(
                            "val_Reconstruction_Loss", float("inf"))
                        outcomes.append((tid, loss))
                return outcomes
        else:
            # single process: trials pause LIVE in-memory between rungs
            # (no epoch retrained, no serialization) — the right unit on
            # one TPU chip where trials share the device anyway
            cache: Dict[int, Any] = {}

            def train_to(tid, epochs):
                try:
                    metrics = continue_trial(trials[tid], tid, epochs,
                                             cache)
                except Exception as e:  # bad draw must not kill the sweep
                    record(tid, None, repr(e))
                    return None
                record(tid, metrics, None)
                return metrics.get("val_Reconstruction_Loss", float("inf"))

        def on_cull(tids):
            # release culled trials' live device state (params + opt
            # moments + dataset) — without this the cache holds every
            # trial for the whole sweep and memory scales with
            # num_samples
            if parallel <= 1:
                for tid in tids:
                    cache.pop(tid, None)

        survivors = run_sha(num_samples, grace, eta, max_t, train_to,
                            rung_runner=rung_runner, on_cull=on_cull)
        print(f"--- asha survivors (best first): {survivors}")
    elif parallel > 1:
        # the honest Ray-actor replacement: one spawned process per
        # trial (own JAX runtime), N at a time
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor
        ctx = mp.get_context("spawn")
        with ProcessPoolExecutor(max_workers=parallel,
                                 mp_context=ctx) as pool:
            for trial_id, metrics, err in pool.map(
                    _trial_entry,
                    [(t, i, out_dir) for i, t in enumerate(trials)]):
                record(trial_id, metrics, err)
    else:
        for trial_id, trial in enumerate(trials):
            tid, metrics, err = _trial_entry((trial, trial_id, out_dir))
            record(tid, metrics, err)

    best = select_best(results)
    print("=== best ===")
    print(json.dumps(best, indent=2, default=str))


if __name__ == "__main__":
    main()
