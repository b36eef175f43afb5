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
        results.append({"trial": trial_id, "loss": loss,
                        "metrics": metrics,
                        "params": _searched(trials[trial_id], spec)})
        best = select_best(results)
        with open(os.path.join(out_dir, "results.json"), "w") as f:
            json.dump({"best": best, "trials": results}, f, indent=2,
                      default=str)
        print(f"    trial {trial_id}: val_Reconstruction_Loss={loss:.5f} "
              f"(best={best['loss']:.5f} @ trial {best['trial']})")

    if parallel > 1:
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
