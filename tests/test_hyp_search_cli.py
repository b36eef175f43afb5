"""Hyperparameter search: unit tests for the ``to_tune`` sampling
semantics (/root/reference/hyperparameter_search.py:35-47) and
best-trial selection, plus an end-to-end in-process run of the CLI
main() on a tiny synthetic sweep.

The e2e test calls ``main()`` in-process (sharing the hermetic CPU
backend from conftest.py) instead of a subprocess — the round-1
subprocess version could hang forever on hosts whose sitecustomize
pre-registers an accelerator backend (JAX_PLATFORMS env alone does not
override it; entry points now call apply_platform_overrides, covered by
test_run_cli_subprocess_smoke in test_two_stage_cli.py)."""

import json
import os
import random
import sys

import yaml

import hyperparameter_search as hs


def test_sample_params_to_tune_semantics():
    """list -> choice, tuple -> uniform, nested-dict spec recursion —
    the reference's exact to_tune rules."""
    config = {
        "model_params": {"latent_dim": [4, 8, 16], "gamma": 0.5,
                         "sub": {"beta": (0.1, 0.9)}},
        "exp_params": {"LR": (0.0005, 0.002), "kld_weight": 0.005},
    }
    spec = {"model_params": {"latent_dim": None, "sub": ["beta"]},
            "exp_params": ["LR"]}
    rng = random.Random(0)
    seen_latent = set()
    for _ in range(50):
        t = hs.sample_params(config, spec, rng)
        assert t["model_params"]["latent_dim"] in (4, 8, 16)
        seen_latent.add(t["model_params"]["latent_dim"])
        assert 0.1 <= t["model_params"]["sub"]["beta"] <= 0.9
        assert 0.0005 <= t["exp_params"]["LR"] <= 0.002
        # non-searched keys untouched
        assert t["model_params"]["gamma"] == 0.5
        assert t["exp_params"]["kld_weight"] == 0.005
    assert seen_latent == {4, 8, 16}
    # seeded reproducibility
    a = hs.sample_params(config, spec, random.Random(7))
    b = hs.sample_params(config, spec, random.Random(7))
    assert a == b


def test_sample_params_list_spec_converts_tuple_leaf():
    """A list spec names keys whose values are converted by type —
    a tuple-valued key under a list spec still becomes uniform."""
    config = {"exp_params": {"LR": (0.1, 0.2), "wd": [0.0, 0.1]}}
    t = hs.sample_params(config, {"exp_params": ["LR", "wd"]},
                         random.Random(1))
    assert 0.1 <= t["exp_params"]["LR"] <= 0.2
    assert t["exp_params"]["wd"] in (0.0, 0.1)


def test_select_best_lowest_loss_wins():
    results = [{"trial": 0, "loss": 3.0}, {"trial": 1, "loss": 1.5},
               {"trial": 2, "loss": float("inf")}]
    assert hs.select_best(results)["trial"] == 1
    assert hs.select_best([]) is None


def test_yaml_tuple_roundtrip(tmp_path):
    """!!python/tuple leaves survive yaml.dump -> yaml.full_load as
    tuples (the reference's uniform-range notation)."""
    path = os.path.join(str(tmp_path), "t.yaml")
    with open(path, "w") as f:
        yaml.dump({"exp_params": {"LR": (0.0005, 0.002)}}, f)
    with open(path) as f:
        loaded = yaml.full_load(f)
    assert isinstance(loaded["exp_params"]["LR"], tuple)


def test_run_sha_rungs_and_promotion():
    """8 trials, grace 1, eta 2, max_t 8: rung budgets 1/2/4/8 epochs,
    the best half survives each rung, budgets only ever increase (no
    epoch retrained)."""
    calls = []

    def train_to(tid, epochs):
        calls.append((tid, epochs))
        return float(tid)  # trial i has stable loss i -> low ids win

    survivors = hs.run_sha(8, 1, 2, 8, train_to)
    assert survivors == [0]
    budgets = {}
    for tid, ep in calls:
        budgets.setdefault(tid, []).append(ep)
    assert all(b[0] == 1 for b in budgets.values())
    assert sorted(t for t, b in budgets.items() if 2 in b) == [0, 1, 2, 3]
    assert sorted(t for t, b in budgets.items() if 4 in b) == [0, 1]
    assert budgets[0] == [1, 2, 4, 8]
    for b in budgets.values():  # strictly increasing per trial
        assert b == sorted(set(b))


def test_run_sha_culls_failures_and_caps_budget():
    """Crashed trials (None) are culled, NaN ranks last, and a
    grace_period above max_t collapses to a single rung at max_t."""
    def train_to(tid, epochs):
        assert epochs == 3  # min(grace=5, max_t=3), single rung
        if tid == 1:
            return None
        if tid == 2:
            return float("nan")
        return float(tid)

    assert hs.run_sha(4, 5, 2, 3, train_to) == [0, 3, 2]


def test_run_sha_on_cull_and_rung_runner():
    """on_cull reports every dropped trial at each rung boundary (and
    frees all live trials once the sweep finishes); rung_runner replaces
    per-trial train_to with whole-rung evaluation."""
    culled, rungs = [], []

    def rung_runner(tids, budget):
        rungs.append((tuple(tids), budget))
        return [(t, float(t)) for t in tids]

    survivors = hs.run_sha(4, 1, 2, 4, None, rung_runner=rung_runner,
                           on_cull=culled.append)
    assert survivors == [0]
    assert rungs == [((0, 1, 2, 3), 1), ((0, 1), 2), ((0,), 4)]
    assert culled == [[2, 3], [1], [0]]


def test_run_sha_on_cull_includes_crashes():
    """A trial that crashes mid-rung is culled AND reported to on_cull
    so its live state is released, not leaked."""
    culled = []

    def train_to(tid, epochs):
        return None if tid == 1 else float(tid)

    survivors = hs.run_sha(4, 1, 2, 4, train_to, on_cull=culled.append)
    assert survivors == [0]
    # crash (1) culled with the rung losers (3 survivors // eta = 1 kept)
    assert culled[0] == [1, 2, 3]


def test_reduction_factor_below_two_raises(tmp_path, monkeypatch):
    """reduction_factor < 2 is a config error, not a silent clamp."""
    import pytest
    tmp = str(tmp_path)
    cfg = _hyp_config(tmp, os.path.join(tmp, "logs"))
    cfg["hyperparameter_search"].update(
        {"scheduler": "asha", "reduction_factor": 1})
    path = os.path.join(tmp, "hyp.yaml")
    with open(path, "w") as f:
        yaml.dump(cfg, f)
    monkeypatch.setattr(sys, "argv", ["hyperparameter_search.py",
                                      "-c", path])
    with pytest.raises(ValueError, match="reduction_factor"):
        hs.main()


def test_run_sha_lone_survivor_trains_to_max_t():
    """A single trial (or lone rung survivor) still trains to max_t."""
    seen = []
    assert hs.run_sha(1, 1, 2, 10, lambda t, e: seen.append(e) or 0.0) \
        == [0]
    assert seen == [1, 2, 4, 8, 10]


def test_shipped_hyp_configs_sample():
    """Every configs_hyp YAML parses with full_load (tuples intact) and
    its search spec draws a valid trial — every searched key exists and
    every sampled leaf is a concrete scalar, not a leftover list/tuple."""
    import glob
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "configs_hyp", "*.yaml")))
    assert paths
    for path in paths:
        with open(path) as f:
            config = yaml.full_load(f)
        hyp = config.pop("hyperparameter_search")
        trial = hs.sample_params(config, hyp.get("params", {}),
                                 random.Random(0))
        for key, val in hs._searched(trial, hyp.get("params", {})).items():
            assert not isinstance(val, (list, tuple)), (path, key, val)
        sched = str(hyp.get("scheduler", "fifo")).lower()
        assert sched in ("fifo", "asha", "sha", "successive_halving")


def _hyp_config(tmp, logdir):
    return {
        "model_params": {"name": "VanillaVAE", "in_channels": 3,
                         "latent_dim": [4, 8], "img_size": 16,
                         "hidden_dims": [8, 16]},
        "data_params": {"data_path": "", "dataset_name": "Synthetic",
                        "train_batch_size": 8, "val_batch_size": 8,
                        "patch_size": 16, "limit": 24, "val_limit": 16},
        "exp_params": {"LR": (0.0005, 0.002), "kld_weight": 0.005,
                       "manual_seed": 3},
        "trainer_params": {"max_epochs": 1},
        "logging_params": {"save_dir": logdir, "name": "VanillaVAE"},
        "hyperparameter_search": {
            "num_samples": 2,
            "resources_per_trial": {"cpu": 1, "gpu": 1},  # ignored knob
            "params": {"model_params": ["latent_dim"],
                       "exp_params": ["LR"]},
        },
    }


def test_hyp_search_end_to_end_inprocess(tmp_path, monkeypatch, capsys):
    tmp = str(tmp_path)
    logdir = os.path.join(tmp, "logs")
    path = os.path.join(tmp, "hyp.yaml")
    with open(path, "w") as f:
        yaml.dump(_hyp_config(tmp, logdir), f)  # dump keeps the tuple

    monkeypatch.setattr(sys, "argv", ["hyperparameter_search.py",
                                      "-c", path])
    hs.main()
    out = capsys.readouterr().out
    assert "=== best ===" in out

    with open(os.path.join(logdir, "VanillaVAE", "hyp_search",
                           "results.json")) as f:
        results = json.load(f)
    assert len(results["trials"]) == 2
    losses = [t["loss"] for t in results["trials"]]
    assert results["best"]["loss"] == min(losses)
    for t in results["trials"]:
        assert t["params"]["model_params.latent_dim"] in (4, 8)
        assert 0.0005 <= t["params"]["exp_params.LR"] <= 0.002


def test_hyp_search_asha_end_to_end_inprocess(tmp_path, monkeypatch,
                                              capsys):
    """scheduler: asha — 3 trials, grace 1, eta 2, max_epochs 2: all
    three train 1 epoch, only the best survivor reaches 2 epochs, and
    results.json keeps one (latest) entry per trial."""
    tmp = str(tmp_path)
    logdir = os.path.join(tmp, "logs")
    cfg = _hyp_config(tmp, logdir)
    cfg["trainer_params"]["max_epochs"] = 2
    cfg["hyperparameter_search"].update(
        {"num_samples": 3, "scheduler": "asha", "grace_period": 1,
         "reduction_factor": 2})
    path = os.path.join(tmp, "hyp_asha.yaml")
    with open(path, "w") as f:
        yaml.dump(cfg, f)

    monkeypatch.setattr(sys, "argv", ["hyperparameter_search.py",
                                      "-c", path])
    hs.main()
    out = capsys.readouterr().out
    assert "asha survivors" in out and "=== best ===" in out

    with open(os.path.join(logdir, "VanillaVAE", "hyp_search",
                           "results.json")) as f:
        results = json.load(f)
    assert len(results["trials"]) == 3  # one entry per trial, no dups
    assert results["best"]["loss"] == min(t["loss"]
                                          for t in results["trials"])


def test_hyp_search_asha_flags_late_crash(tmp_path, monkeypatch, capsys):
    """A trial that clears rung 1 then crashes at rung 2 must not stay
    'best' through its stale rung-1 entry — results.json flags it failed
    with loss inf (round-2 advisor finding)."""
    tmp = str(tmp_path)
    logdir = os.path.join(tmp, "logs")
    cfg = _hyp_config(tmp, logdir)
    cfg["trainer_params"]["max_epochs"] = 2
    cfg["hyperparameter_search"].update(
        {"num_samples": 2, "scheduler": "asha", "grace_period": 1,
         "reduction_factor": 2})
    path = os.path.join(tmp, "hyp_asha.yaml")
    with open(path, "w") as f:
        yaml.dump(cfg, f)

    orig = hs.continue_trial
    recorded = {}

    def crashing(trial_config, trial_id, target_epochs, cache):
        metrics = orig(trial_config, trial_id, target_epochs, cache)
        if target_epochs == 1:
            recorded[trial_id] = metrics["val_Reconstruction_Loss"]
        if target_epochs > 1:
            raise RuntimeError("synthetic late-rung crash")
        return metrics

    monkeypatch.setattr(hs, "continue_trial", crashing)
    monkeypatch.setattr(sys, "argv", ["hyperparameter_search.py",
                                      "-c", path])
    hs.main()
    with open(os.path.join(logdir, "VanillaVAE", "hyp_search",
                           "results.json")) as f:
        results = json.load(f)
    # rung 1 recorded both; the rung-1 winner crashed at rung 2 -> its
    # entry must be flagged failed and out of best-selection
    winner = min(recorded, key=recorded.get)
    entry = {t["trial"]: t for t in results["trials"]}[winner]
    assert entry["loss"] == float("inf")
    assert entry.get("failed"), entry
    assert results["best"] is None or results["best"]["trial"] != winner


def test_hyp_search_asha_rung_parallel(tmp_path, monkeypatch, capsys):
    """scheduler: asha + parallel_trials: 2 — each rung evaluates its
    trials in a spawned process pool; cross-rung state resumes from the
    orbax checkpoints (no epoch retrained). The best survivor must reach
    max_epochs and results.json must carry one entry per trial."""
    tmp = str(tmp_path)
    logdir = os.path.join(tmp, "logs")
    cfg = _hyp_config(tmp, logdir)
    cfg["trainer_params"]["max_epochs"] = 2
    cfg["hyperparameter_search"].update(
        {"num_samples": 2, "scheduler": "asha", "grace_period": 1,
         "reduction_factor": 2, "parallel_trials": 2})
    path = os.path.join(tmp, "hyp_asha_par.yaml")
    with open(path, "w") as f:
        yaml.dump(cfg, f)

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/ctvae_jax_cache")
    monkeypatch.setenv("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    monkeypatch.setattr(sys, "argv", ["hyperparameter_search.py",
                                      "-c", path])
    hs.main()
    out = capsys.readouterr().out
    assert "rung-parallel" in out
    assert "asha survivors" in out and "=== best ===" in out

    with open(os.path.join(logdir, "VanillaVAE", "hyp_search",
                           "results.json")) as f:
        results = json.load(f)
    assert len(results["trials"]) == 2
    assert results["best"]["loss"] == min(t["loss"]
                                          for t in results["trials"])
    # the winning trial's checkpoint dir must exist with a 'last' at
    # step >= 2 epochs worth of batches (it resumed, not restarted)
    best_tid = results["best"]["trial"]
    ckpt_dir = os.path.join(logdir, "VanillaVAE", "hyp_search",
                            f"trial_{best_tid}", "checkpoints")
    assert os.path.exists(os.path.join(ckpt_dir, "last"))


def test_hyp_search_parallel_trials(tmp_path, monkeypatch, capsys):
    """The Ray-actor replacement: ``parallel_trials: 2`` runs each trial
    in its own spawned process (own JAX runtime). Results must carry
    both trials and pick the same best-by-loss."""
    tmp = str(tmp_path)
    logdir = os.path.join(tmp, "logs")
    cfg = _hyp_config(tmp, logdir)
    cfg["hyperparameter_search"]["parallel_trials"] = 2
    path = os.path.join(tmp, "hyp.yaml")
    with open(path, "w") as f:
        yaml.dump(cfg, f)

    # spawned trial processes must be hermetic on CPU like the parent
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/ctvae_jax_cache")
    monkeypatch.setenv("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    monkeypatch.setattr(sys, "argv", ["hyperparameter_search.py",
                                      "-c", path])
    hs.main()
    out = capsys.readouterr().out
    assert "=== best ===" in out

    with open(os.path.join(logdir, "VanillaVAE", "hyp_search",
                           "results.json")) as f:
        results = json.load(f)
    assert len(results["trials"]) == 2
    losses = [t["loss"] for t in results["trials"]]
    assert results["best"]["loss"] == min(losses)
