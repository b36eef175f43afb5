"""Independent brute-force recomputation of DCI / MIG / SAP / FactorVAE
on nontrivial random problems (round-2 VERDICT item 4) — the
metric-layer analogue of tests/pyg_fixture.py.

No ground-truth metric library exists on this host (`disent` /
`disentanglement_lib` are not installed and there is no egress), so each
metric's aggregation math is recomputed from first principles here —
direct joint-histogram mutual information with hand-counted
probabilities, exhaustive vote counting with explicit variance formulas,
per-factor single-latent classifier gap matrices, hand-rolled
entropy-weighted DCI scores — by code that shares NOTHING with
``ctvae_tpu/metrics/disentanglement.py`` except sklearn's estimator
classes (which play the role of a third-party fixed component, like
torch in pyg_fixture). Product and brute-force must agree to float
precision on a 600+ point, 4-factor, noisy-mixture problem with
cross-talk and dead latent dimensions.

Reference chain being validated: /root/reference/metrics/metric.py:8-64
wraps disent's ports of disentanglement_lib's published metrics.
"""

import math

import numpy as np
import pytest

from ctvae_tpu.metrics.disentanglement import (metric_dci,
                                               metric_factor_vae,
                                               metric_mig, metric_sap)

SIZES = (4, 5, 3, 6)          # 4 factors, 360-combo grid
D = 6                         # 4 noisy-mixture dims + 2 pure-noise dims
F = len(SIZES)


def _z_table(seed=0, noise=0.25):
    """z = A f + noise with cross-talk between factors and two dead
    dims — the 'noisy mixture' problem class the VERDICT asks for."""
    rng = np.random.default_rng(seed)
    A = np.zeros((D, F))
    A[0, 0], A[0, 1] = 1.0, 0.35      # z0 reads f0 with f1 cross-talk
    A[1, 1] = 0.8
    A[2, 2], A[2, 3] = 1.2, 0.2
    A[3, 3], A[3, 0] = 0.7, 0.15
    grid = np.indices(SIZES).reshape(F, -1).T
    return grid @ A.T + rng.normal(0.0, noise, (len(grid), D))


class TableSampler:
    """GroundTruthSampler-compatible sampler over a precomputed z table:
    observations ARE the codes (image-shaped [B,1,1,D]), so repr_fn is a
    flatten and (factors -> z) is a deterministic lookup — which lets
    the brute-force side replay the exact same data stream from an
    identically-seeded instance."""

    def __init__(self, z, seed=0):
        self.factor_sizes = SIZES
        self.rng = np.random.default_rng(seed)
        self.z = z
        self.strides = np.cumprod((1,) + SIZES[::-1][:-1])[::-1]

    def sample_factors(self, n):
        return np.stack([self.rng.integers(0, s, n)
                         for s in self.factor_sizes], axis=1)

    def observations_from_factors(self, factors):
        idx = (np.asarray(factors) * self.strides).sum(-1).astype(int)
        return self.z[idx][:, None, None, :]

    def sample(self, n):
        f = self.sample_factors(n)
        return f, self.observations_from_factors(f)


def repr_fn(x):
    return np.asarray(x).reshape(len(x), -1)


def _replay_stream(s, num, batch_size=64):
    """Replicate the product's chunked collection stream (same sampler
    seed, same chunk sizes -> same rng draws) with local code."""
    fs, zs = [], []
    left = num
    while left > 0:
        b = min(batch_size, left)
        f, x = s.sample(b)
        fs.append(f)
        zs.append(repr_fn(x))
        left -= b
    return np.concatenate(fs), np.concatenate(zs)


# ---------------------------------------------------------------------------
# MIG — direct joint-histogram mutual information
# ---------------------------------------------------------------------------

def _brute_entropy(labels):
    n = len(labels)
    h = 0.0
    for v in set(labels.tolist()):
        p = (labels == v).sum() / n
        h -= p * math.log(p)
    return h


def _brute_mi(a, b):
    """MI from hand-counted joint/marginal frequencies (natural log)."""
    n = len(a)
    joint = {}
    for x, y in zip(a.tolist(), b.tolist()):
        joint[(x, y)] = joint.get((x, y), 0) + 1
    pa, pb = {}, {}
    for (x, y), c in joint.items():
        pa[x] = pa.get(x, 0) + c
        pb[y] = pb.get(y, 0) + c
    mi = 0.0
    for (x, y), c in joint.items():
        mi += (c / n) * math.log((c / n) / ((pa[x] / n) * (pb[y] / n)))
    return mi


def _brute_bin20(col):
    """20 equal-width bins over [min, max] — the same rule as
    np.histogram(x, 20) edges + np.digitize, spelled as comparisons."""
    edges = np.linspace(col.min(), col.max(), 21)[:20]
    return np.sum(col[:, None] >= edges[None, :], axis=1)


def test_mig_matches_bruteforce():
    z = _z_table()
    ours = metric_mig(TableSampler(z, seed=3), repr_fn,
                      num_train=600, batch_size=64)["mig.discrete_score"]

    f, codes = _replay_stream(TableSampler(z, seed=3), 600)
    mi = np.zeros((D, F))
    for i in range(D):
        binned = _brute_bin20(codes[:, i])
        for j in range(F):
            mi[i, j] = _brute_mi(binned, f[:, j])
    gaps = []
    for j in range(F):
        col = sorted(mi[:, j], reverse=True)
        gaps.append((col[0] - col[1]) / _brute_entropy(f[:, j]))
    brute = float(np.mean(gaps))
    assert ours == pytest.approx(brute, abs=1e-10)
    assert 0.05 < ours < 1.0   # nontrivial problem: neither 0 nor exact


# ---------------------------------------------------------------------------
# SAP — per-factor single-latent classifier gap matrix
# ---------------------------------------------------------------------------

def test_sap_matches_bruteforce():
    from sklearn.svm import LinearSVC
    z = _z_table()
    ours = metric_sap(TableSampler(z, seed=5), repr_fn, num_train=600,
                      num_test=300, batch_size=64)["sap.score"]

    # NB the product collects test from the SAME sampler instance, so
    # the test stream continues the train stream's rng
    s = TableSampler(z, seed=5)
    f_tr, z_tr = _replay_stream(s, 600)
    f_te, z_te = _replay_stream(s, 300)
    score = np.zeros((D, F))
    for i in range(D):
        for j in range(F):
            clf = LinearSVC(C=0.01, class_weight="balanced", dual="auto",
                            max_iter=2000)
            clf.fit(z_tr[:, [i]], f_tr[:, j])
            score[i, j] = float(
                np.mean(clf.predict(z_te[:, [i]]) == f_te[:, j]))
    gaps = []
    for j in range(F):
        col = sorted(score[:, j], reverse=True)
        gaps.append(col[0] - col[1])
    assert ours == pytest.approx(float(np.mean(gaps)), abs=1e-10)


# ---------------------------------------------------------------------------
# DCI — hand-rolled entropy-weighted scores over refit importances
# ---------------------------------------------------------------------------

def test_dci_matches_bruteforce():
    from sklearn.ensemble import GradientBoostingClassifier
    z = _z_table()
    ours = metric_dci(TableSampler(z, seed=7), repr_fn, num_train=400,
                      num_test=200, batch_size=64, n_estimators=40,
                      random_state=0)

    s = TableSampler(z, seed=7)
    f_tr, z_tr = _replay_stream(s, 400)
    f_te, z_te = _replay_stream(s, 200)
    imp = np.zeros((D, F))
    accs_tr, accs_te = [], []
    for j in range(F):
        clf = GradientBoostingClassifier(n_estimators=40, max_depth=3,
                                         random_state=0)
        clf.fit(z_tr, f_tr[:, j])
        imp[:, j] = np.abs(clf.feature_importances_)
        accs_tr.append(float(np.mean(clf.predict(z_tr) == f_tr[:, j])))
        accs_te.append(float(np.mean(clf.predict(z_te) == f_te[:, j])))

    # disentanglement: per-code entropy over factors (base F), weighted
    # by the code's share of total importance
    d_scores, weights = [], []
    for i in range(D):
        row = imp[i]
        tot = max(row.sum(), 1e-11)
        p = row / tot
        h = -sum(pi * math.log(max(pi, 1e-11)) for pi in p)
        d_scores.append(1.0 - h / math.log(F))
        weights.append(tot)
    wsum = max(sum(weights), 1e-11)
    brute_d = sum(ds * w / wsum for ds, w in zip(d_scores, weights))
    # completeness: per-factor entropy over codes (base D), plain mean
    c_scores = []
    for j in range(F):
        col = imp[:, j]
        p = col / max(col.sum(), 1e-11)
        h = -sum(pi * math.log(max(pi, 1e-11)) for pi in p)
        c_scores.append(1.0 - h / math.log(D))
    brute_c = float(np.mean(c_scores))

    assert ours["dci.disentanglement"] == pytest.approx(brute_d, abs=1e-9)
    assert ours["dci.completeness"] == pytest.approx(brute_c, abs=1e-9)
    assert ours["dci.informativeness_train"] == pytest.approx(
        float(np.mean(accs_tr)), abs=1e-9)
    assert ours["dci.informativeness_test"] == pytest.approx(
        float(np.mean(accs_te)), abs=1e-9)
    assert 0.0 < ours["dci.disentanglement"] < 1.0


# ---------------------------------------------------------------------------
# FactorVAE score — exhaustive vote counting with explicit variances
# ---------------------------------------------------------------------------

def test_factor_vae_matches_bruteforce():
    z = _z_table()
    ours = metric_factor_vae(TableSampler(z, seed=11), repr_fn,
                             num_train=300, num_eval=150, batch_size=32,
                             num_variance_estimate=256)

    s = TableSampler(z, seed=11)
    _, x = s.sample(256)
    rep = repr_fn(x)
    n = len(rep)
    mean = rep.sum(0) / n
    global_var = ((rep - mean) ** 2).sum(0) / (n - 1)   # explicit ddof=1
    active = [i for i in range(D)
              if math.sqrt(global_var[i]) >= 0.05]
    assert active, "problem must keep active dims"

    def brute_votes(count):
        votes = np.zeros((F, D), np.int64)
        for _ in range(count):
            j = int(s.rng.integers(0, F))
            fixed = s.sample_factors(32)
            fixed[:, j] = fixed[0, j]
            obs = repr_fn(s.observations_from_factors(fixed))
            m = obs.sum(0) / len(obs)
            local_var = ((obs - m) ** 2).sum(0) / (len(obs) - 1)
            best, best_ratio = None, None
            for i in active:
                ratio = local_var[i] / max(global_var[i], 1e-11)
                if best_ratio is None or ratio < best_ratio:
                    best, best_ratio = i, ratio
            votes[j, best] += 1
        return votes

    train_votes = brute_votes(300)
    classifier = [int(np.argmax(train_votes[:, i])) for i in range(D)]
    train_acc = sum(train_votes[classifier[i], i]
                    for i in range(D)) / train_votes.sum()
    eval_votes = brute_votes(150)
    eval_acc = sum(eval_votes[classifier[i], i]
                   for i in range(D)) / eval_votes.sum()

    assert ours["factor_vae.num_active_dims"] == len(active)
    assert ours["factor_vae.mean_accuracy"] == pytest.approx(
        float(train_acc), abs=1e-12)
    assert ours["factor_vae.eval_accuracy"] == pytest.approx(
        float(eval_acc), abs=1e-12)
    assert 0.3 < ours["factor_vae.mean_accuracy"] <= 1.0
