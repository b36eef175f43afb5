"""Seeded end-to-end loss-trajectory parity vs the torch reference.

Runs tests/e2e_trajectory_driver.py in a float64 subprocess: both
frameworks train from transplanted identical weights on identical data
with identical injected noise for 2 epochs (BASELINE.md north-star
protocol; /root/reference/configs/vae.yaml / ct_mcq_vae.yaml shapes).

VanillaVAE and VQVAE must track torch per-step within 1e-5 relative.

CT-MCQ-VAE needs a calibrated assertion: the model amplifies float
noise by ~1e4-1e8 per step through its argmax/threshold-adjacent
softmax chains, so NO cross-implementation can hold a long trajectory
bitwise — including torch vs itself with Adam's elementwise ops
reordered. The driver therefore also runs a CONTROL: the same torch
model trained with a hand-written Adam in optax's exact op order.
The test asserts (a) exact parity at step 0, (b) jax == control while
they are coherent (update math identical), and (c) the jax-vs-torch
divergence profile is bounded by the optimizer-rounding control's own
profile — i.e. everything separating us from torch is rounding, not
semantics. Step-level loss AND gradient parity at matched states is
pinned separately (test_ct_reference_parity.py, 1e-14)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_driver(model, timeout=2700):
    """Run the float64 side-by-side driver for one key (or several,
    comma-separated — one subprocess amortizes the ~1 min interpreter +
    import + reference-install startup over all of them). Returns the
    payload dict for a single key, or {model: payload} for several."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # single CPU device is plenty
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests",
                                      "e2e_trajectory_driver.py"), model],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=timeout)
    assert r.returncode == 0, r.stdout[-500:] + r.stderr[-2000:]
    payloads = [json.loads(line) for line in r.stdout.strip().splitlines()
                if line.startswith("{")]
    if "," not in model:
        return payloads[-1]
    return {p["model"]: p for p in payloads}


@pytest.mark.slow
def test_vanilla_trajectory_parity():
    d = _run_driver("vanilla")
    assert d["steps"] == 10
    assert d["max_rel_diff"] < 1e-5, d["rel_diffs"]
    # and training actually trains
    assert d["torch_last"] < d["torch_first"]


@pytest.mark.slow
def test_vqvae_trajectory_parity():
    d = _run_driver("vqvae")
    assert d["steps"] == 10
    assert d["max_rel_diff"] < 1e-5, d["rel_diffs"]


@pytest.mark.slow
def test_betab_capacity_annealing_trajectory_parity():
    """BetaVAE loss_type='B': the reference drives capacity C from a
    class-level ``num_iter`` counter incremented inside loss_function
    (/root/reference/models/beta_vae.py:10,132,147); ctvae_tpu passes an
    explicit ``step``. The annealed C must advance identically or the
    gamma*|kld - C| loss diverges from step 1."""
    d = _run_driver("betab")
    assert d["steps"] == 10
    assert d["rel_diffs"][0] < 1e-12, d["rel_diffs"]  # transplanted state exact
    assert d["max_rel_diff"] < 1e-5, d["rel_diffs"]


@pytest.mark.slow
def test_fvae_two_phase_update_parity():
    """FactorVAE dual-optimizer protocol over a full trajectory
    (VERDICT round-1 weak #7). The driver trains three times: the
    reference's exact retain_first_backpass protocol (false-class grad
    at pre-update params via the retained phase-0 graph), a torch
    CONTROL implementing ctvae_tpu's documented functional semantics
    (false term at current params on the phase's own z), and jax.

    jax must track the control (same semantics, torch.optim.Adam vs
    optax rounding is the only separation); the exact-vs-control gap is
    the deliberate, documented protocol deviation (PARITY.md)."""
    d = _run_driver("fvae")
    jvc = d["jax_vs_control_rel"]
    # transplanted state: phase-0 step-0 loss exact
    assert d["rel_diffs"][0] < 1e-12
    # first two full dual-phase cycles: jax == functional control
    assert max(jvc[:4]) < 1e-5, jvc
    # bounded drift thereafter (optimizer rounding amplified by the
    # adversarial discriminator path)
    assert max(jvc) < 0.2, jvc
    assert all(np.isfinite(d["jax_losses"]))


# Zoo-wide sweep: every remaining model family with a torch-comparable
# trajectory, grouped so each subprocess stays well under the per-test
# budget. Per-key tolerance: float64 rounding amplified ~10x/step by
# Adam's sqrt/div nonlinearity bounds every standard-backbone model
# below 1e-5 over 10 steps (measured; most sit at 1e-8..5e-7).
ZOO_GROUPS = {
    "gaussian": ["betah", "iwae", "miwae", "cat", "joint", "dip"],
    "nonelbo": ["logcosh", "mssim", "wae_imq", "wae_rbf", "swae", "info"],
    "conditional": ["vamp", "cvae", "gamma", "betatc"],
    "hierarchical": ["mcq", "hvae", "lvae"],
}
# VampVAE's logsumexp-over-pseudo-components amplifies rounding faster
# than the rest of the zoo (measured 4e-6 at step 10)
ZOO_TOL = {"vamp": 1e-4}


@pytest.mark.slow
@pytest.mark.parametrize("group", sorted(ZOO_GROUPS))
def test_zoo_trajectory_parity(group):
    keys = ZOO_GROUPS[group]
    results = _run_driver(",".join(keys), timeout=3000)
    failures = {}
    for key in keys:
        d = results[key]
        assert d["steps"] == 10, (key, d["steps"])
        assert all(np.isfinite(d["jax_losses"])), (key, d["jax_losses"])
        tol = ZOO_TOL.get(key, 1e-5)
        if d["max_rel_diff"] >= tol:
            failures[key] = d["rel_diffs"]
    assert not failures, failures


@pytest.mark.slow
def test_dfc_trajectory_parity():
    """DFCVAE with identical VGG19-bn weights on both sides (the
    torchvision-format fixture from test_vgg_parity, loaded into our
    frozen collection through the production load_vgg19_bn_weights
    path). 5 steps at batch 2 — the float64 VGG forward+backward
    dominates the whole zoo's cost, and 5 Adam steps already pin the
    perceptual-loss gradient path."""
    d = _run_driver("dfc", timeout=3000)
    assert d["steps"] == 5
    assert d["rel_diffs"][0] < 1e-12, d["rel_diffs"]
    assert d["max_rel_diff"] < 1e-5, d["rel_diffs"]
    assert d["torch_last"] < d["torch_first"]


@pytest.mark.slow
def test_ct_trajectory_parity_all_modes():
    d = _run_driver("ct")
    assert d["steps"] == 10
    rel = d["rel_diffs"]
    ctl = d["control_rel_diffs"]
    jvc = d["jax_vs_control_rel"]

    # (a) transplanted state: first step exact (forward+loss semantics)
    assert rel[0] < 1e-12, rel
    # (b) identical update math: jax tracks the optax-op-order control
    # through the first three steps (two optimizer applications)
    assert max(jvc[:3]) < 1e-8, jvc
    # (c) the divergence from torch.optim.Adam is bounded by the
    # optimizer-rounding control's own divergence profile
    assert max(rel) <= max(10 * max(ctl), 1e-6), (rel, ctl)
    assert float(np.mean(rel)) <= 10 * float(np.mean(ctl)) + 1e-6
    # both runs stay in the same loss regime per mode
    for i in range(d["steps"]):
        assert np.isfinite(d["jax_losses"][i])
