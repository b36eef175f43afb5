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
``reduction_factor`` (η, default 2). Every trial trains to the first
rung's budget; the best ``1/η`` continue to an ``η``-times-larger
budget, and so on until ``trainer_params.max_epochs``. Trials pause
in-process (their train state stays live) and resume exactly where they
stopped, so no epoch is retrained. Scheduler runs are sequential —
pausing at rung boundaries requires the trials to share one process.
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
            max_t: int, train_to) -> list:
    """Synchronous successive halving over ``num_trials`` trials.

    ``train_to(trial_id, target_epochs) -> float | None`` continues the
    trial's training up to ``target_epochs`` total epochs and returns
    its current objective (lower is better), or None on failure. Rung
    budgets are ``grace_period * reduction_factor**i`` epochs, capped at
    ``max_t``; after each rung only the best ``1/reduction_factor``
    survive (at least one). Failed trials are culled immediately.
    Returns the trial ids alive after the final rung, best first.

    This is the sequential analogue of Ray Tune's ``ASHAScheduler``
    (arXiv:1810.05934) — synchronous because local trials share one
    device, so there is no straggler problem for ASHA's asynchronous
    promotion rule to solve.
    """
    eta = max(2, int(reduction_factor))
    budget = max(1, int(grace_period))
    max_t = max(1, int(max_t))
    alive = list(range(num_trials))
    while True:
        budget = min(budget, max_t)
        scores = []
        for tid in alive:
            loss = train_to(tid, budget)
            if loss is None:
                continue  # crashed trial: cull
            scores.append((loss if math.isfinite(loss) else float("inf"),
                           tid))
        scores.sort(key=lambda s: s[0])
        if budget >= max_t:
            return [tid for _, tid in scores]
        if not scores:
            return []
        alive = [tid for _, tid in scores[:max(1, len(scores) // eta)]]
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

    def record(trial_id, metrics, err):
        if err is not None:
            print(f"    trial {trial_id} failed: {err}")
            return
        loss = metrics.get("val_Reconstruction_Loss", float("inf"))
        # a trial reports once per rung under the asha scheduler — keep
        # only its latest entry
        results[:] = [r for r in results if r["trial"] != trial_id]
        results.append({"trial": trial_id, "loss": loss,
                        "metrics": metrics,
                        "params": _searched(trials[trial_id], spec)})
        best = select_best(results)
        with open(os.path.join(out_dir, "results.json"), "w") as f:
            json.dump({"best": best, "trials": results}, f, indent=2,
                      default=str)
        print(f"    trial {trial_id}: val_Reconstruction_Loss={loss:.5f} "
              f"(best={best['loss']:.5f} @ trial {best['trial']})")

    scheduler = str(hyp.get("scheduler", "fifo")).lower()
    if scheduler in ("asha", "sha", "successive_halving"):
        if parallel > 1:
            print(f"--- scheduler: {scheduler} runs sequentially "
                  "(pausing at rung boundaries keeps all trials in one "
                  f"process); ignoring parallel_trials={parallel}")
        grace = int(hyp.get("grace_period", 1))
        eta = int(hyp.get("reduction_factor", 2))
        max_t = int(config.get("trainer_params", {}).get("max_epochs", 10))
        cache: Dict[int, Any] = {}

        def train_to(tid, epochs):
            try:
                metrics = continue_trial(trials[tid], tid, epochs, cache)
            except Exception as e:  # a bad draw must not kill the sweep
                record(tid, None, repr(e))
                return None
            record(tid, metrics, None)
            return metrics.get("val_Reconstruction_Loss", float("inf"))

        survivors = run_sha(num_samples, grace, eta, max_t, train_to)
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
