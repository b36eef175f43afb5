"""Native disentanglement metrics: DCI, MIG, SAP, FactorVAE score.

The reference wraps the ``disent`` library's implementations
(/root/reference/metrics/metric.py:8-14), which are themselves ports of
Google's ``disentanglement_lib`` evaluation metrics. These are
self-contained re-implementations of the published algorithms
(sklearn + numpy), matched to ``disentanglement_lib``'s semantics
per-metric:

* MIG (``evaluation/metrics/mig.py``): 20-bin histogram discretization,
  discrete mutual information, mean over factors of the top-1/top-2 MI
  gap normalized by the factor entropy.
* SAP (``evaluation/metrics/sap_score.py``, discrete branch):
  one-latent classifiers ``LinearSVC(C=0.01, class_weight="balanced")``
  scored by test accuracy; mean over factors of the top-1/top-2 gap.
* DCI (``evaluation/metrics/dci.py``): per-factor gradient-boosted-tree
  importances (sklearn defaults), entropy-based disentanglement /
  completeness, train/test informativeness accuracies.
* FactorVAE score (``evaluation/metrics/factor_vae.py``): global
  variances from ``num_variance_estimate`` samples, collapsed dims
  pruned at std >= 0.05 (the published ``prune_dims.threshold`` gin
  config), then ONE majority vote per training/eval point — each vote
  is the argmin over active dims of (local variance of a fixed-factor
  batch) / (global variance).

Operates on any dataset exposing ``factor_sizes`` and a way to fetch
observations for sampled factor combinations. The representation
function contract matches the reference (``experiment.py:81-85``): a
callable mapping a batch of observations [B, H, W, C] to codes [B, D].
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import numpy as np

Array = np.ndarray
ReprFn = Callable[[Array], Array]


class GroundTruthSampler:
    """Samples (factors, observations) from a factor dataset.

    Works with ``ArrayFactorDataset`` (complete row-major factor grids,
    via ``factor_to_index``) and falls back to sampling dataset rows
    directly (with their stored factors) otherwise.
    """

    def __init__(self, dataset, rng: Optional[np.random.Generator] = None):
        self.ds = dataset
        self.factor_sizes = tuple(dataset.factor_sizes)
        self.rng = rng or np.random.default_rng(0)
        self._grid = hasattr(dataset, "factor_to_index")
        # procedural datasets can render arbitrary factor combinations
        self._own = (not self._grid
                     and hasattr(dataset, "observations_from_factors"))

    def sample_factors(self, n: int) -> Array:
        return np.stack([self.rng.integers(0, s, n)
                         for s in self.factor_sizes], axis=1)

    def observations_from_factors(self, factors: Array) -> Array:
        if self._grid:
            raw = self.ds.factor_to_index(factors)
            if hasattr(self.ds.transform, "batch"):
                raws = np.stack([np.asarray(self.ds.images_raw[int(i)])
                                 for i in raw])
                return self.ds.transform.batch(raws)
            return np.stack([self.ds.transform(self.ds.images_raw[int(i)])
                             for i in raw])
        if self._own:
            return np.asarray(self.ds.observations_from_factors(factors))
        raise NotImplementedError(
            "fixed-factor sampling needs a grid dataset or a dataset-"
            "provided observations_from_factors")

    def sample(self, n: int) -> Tuple[Array, Array]:
        if self._grid or self._own:
            f = self.sample_factors(n)
            return f, self.observations_from_factors(f)
        idx = self.rng.integers(0, len(self.ds), n)
        if hasattr(self.ds, "get_batch"):
            imgs, factors = self.ds.get_batch(idx)
        else:
            pairs = [self.ds[int(i)] for i in idx]
            imgs = np.stack([p[0] for p in pairs])
            factors = np.stack([p[1] for p in pairs])
        return np.asarray(factors), imgs


def _collect(sampler: GroundTruthSampler, repr_fn: ReprFn, num: int,
             batch_size: int) -> Tuple[Array, Array]:
    fs, zs = [], []
    done = 0
    while done < num:
        b = min(batch_size, num - done)
        f, x = sampler.sample(b)
        z = np.asarray(repr_fn(x))
        fs.append(f)
        zs.append(z)
        done += b
    return np.concatenate(fs), np.concatenate(zs)


def _discretize(z: Array, bins: int = 20) -> Array:
    out = np.zeros_like(z, dtype=np.int64)
    for i in range(z.shape[1]):
        out[:, i] = np.digitize(z[:, i],
                                np.histogram(z[:, i], bins)[1][:-1])
    return out


def _discrete_mi(z_disc: Array, factors: Array) -> Array:
    from sklearn.metrics import mutual_info_score
    D, F = z_disc.shape[1], factors.shape[1]
    mi = np.zeros((D, F))
    for i in range(D):
        for j in range(F):
            mi[i, j] = mutual_info_score(factors[:, j], z_disc[:, i])
    return mi


def _factor_entropies(factors: Array) -> Array:
    from sklearn.metrics import mutual_info_score
    return np.array([mutual_info_score(factors[:, j], factors[:, j])
                     for j in range(factors.shape[1])])


# ---------------------------------------------------------------------------
# MIG
# ---------------------------------------------------------------------------

def metric_mig(sampler: GroundTruthSampler, repr_fn: ReprFn,
               num_train: int = 1000, batch_size: int = 64,
               **kwargs) -> Dict[str, float]:
    factors, z = _collect(sampler, repr_fn, num_train, batch_size)
    mi = _discrete_mi(_discretize(z), factors)            # [D, F]
    h = _factor_entropies(factors)
    sorted_mi = np.sort(mi, axis=0)[::-1]
    gap = (sorted_mi[0] - sorted_mi[1]) / np.maximum(h, 1e-12)
    return {"mig.discrete_score": float(np.mean(gap))}


# ---------------------------------------------------------------------------
# SAP
# ---------------------------------------------------------------------------

def metric_sap(sampler: GroundTruthSampler, repr_fn: ReprFn,
               num_train: int = 1000, num_test: int = 500,
               batch_size: int = 64, **kwargs) -> Dict[str, float]:
    from sklearn.svm import LinearSVC
    f_tr, z_tr = _collect(sampler, repr_fn, num_train, batch_size)
    f_te, z_te = _collect(sampler, repr_fn, num_test, batch_size)
    D, F = z_tr.shape[1], f_tr.shape[1]
    score = np.zeros((D, F))
    for i in range(D):
        x_tr = z_tr[:, i:i + 1]
        x_te = z_te[:, i:i + 1]
        for j in range(F):
            if len(np.unique(f_tr[:, j])) < 2:
                continue
            # discrete-factor branch of disentanglement_lib sap_score.py
            clf = LinearSVC(C=0.01, class_weight="balanced", dual="auto",
                            max_iter=2000)
            clf.fit(x_tr, f_tr[:, j])
            score[i, j] = np.mean(clf.predict(x_te) == f_te[:, j])
    sorted_s = np.sort(score, axis=0)[::-1]
    return {"sap.score": float(np.mean(sorted_s[0] - sorted_s[1]))}


# ---------------------------------------------------------------------------
# DCI
# ---------------------------------------------------------------------------

def _dci_scores(importance: Array) -> Tuple[float, float]:
    """Entropy-based disentanglement/completeness of a [D codes, F
    factors] importance matrix (disentanglement_lib dci.py)."""

    def _entropy_rows(p, axis):
        p = p / np.maximum(p.sum(axis=axis, keepdims=True), 1e-11)
        base = p.shape[axis]
        return 1.0 - (-np.sum(p * np.log(np.maximum(p, 1e-11)), axis=axis)
                      / np.log(base))

    code_importance = importance.sum(axis=1)
    disent_per_code = _entropy_rows(importance, axis=1)
    weights = code_importance / np.maximum(code_importance.sum(), 1e-11)
    disentanglement = float(np.sum(disent_per_code * weights))
    completeness = float(np.mean(_entropy_rows(importance, axis=0)))
    return disentanglement, completeness


def metric_dci(sampler: GroundTruthSampler, repr_fn: ReprFn,
               num_train: int = 1000, num_test: int = 500,
               batch_size: int = 64, n_estimators: int = 100,
               max_depth: int = 3, random_state=None,
               **kwargs) -> Dict[str, float]:
    # disentanglement_lib dci.py uses sklearn's default
    # GradientBoostingClassifier (100 trees, depth 3); keep those
    # defaults, overridable for cheap smoke runs. random_state=None is
    # the lib default too; pass an int for bit-reproducible fits (the
    # tree splitter breaks feature ties randomly otherwise).
    from sklearn.ensemble import GradientBoostingClassifier
    f_tr, z_tr = _collect(sampler, repr_fn, num_train, batch_size)
    f_te, z_te = _collect(sampler, repr_fn, num_test, batch_size)
    D, F = z_tr.shape[1], f_tr.shape[1]
    importance = np.zeros((D, F))
    acc_tr, acc_te = [], []
    for j in range(F):
        if len(np.unique(f_tr[:, j])) < 2:
            acc_tr.append(1.0)
            acc_te.append(1.0)
            continue
        clf = GradientBoostingClassifier(n_estimators=n_estimators,
                                         max_depth=max_depth,
                                         random_state=random_state)
        clf.fit(z_tr, f_tr[:, j])
        importance[:, j] = np.abs(clf.feature_importances_)
        acc_tr.append(float(np.mean(clf.predict(z_tr) == f_tr[:, j])))
        acc_te.append(float(np.mean(clf.predict(z_te) == f_te[:, j])))

    disentanglement, completeness = _dci_scores(importance)
    return {"dci.disentanglement": disentanglement,
            "dci.completeness": completeness,
            "dci.informativeness_train": float(np.mean(acc_tr)),
            "dci.informativeness_test": float(np.mean(acc_te))}


# ---------------------------------------------------------------------------
# FactorVAE score
# ---------------------------------------------------------------------------

def metric_factor_vae(sampler: GroundTruthSampler, repr_fn: ReprFn,
                      num_train: int = 1000, num_eval: int = 500,
                      batch_size: int = 64,
                      num_variance_estimate: int = 512,
                      prune_threshold: float = 0.05,
                      **kwargs) -> Dict[str, float]:
    _, x = sampler.sample(num_variance_estimate)
    z = np.asarray(repr_fn(x))
    global_var = np.var(z, axis=0, ddof=1)
    # collapsed dims: std below the published prune_dims.threshold gin
    # value (disentanglement_lib factor_vae.py::_prune_dims)
    active = np.sqrt(global_var) >= prune_threshold
    if not np.any(active):
        return {"factor_vae.mean_accuracy": 0.0,
                "factor_vae.eval_accuracy": 0.0,
                "factor_vae.num_active_dims": 0}

    def vote(n):
        # one vote per training/eval point, each from its own
        # fixed-factor batch (factor_vae.py::_generate_training_batch)
        votes = np.zeros((len(sampler.factor_sizes), z.shape[1]), np.int64)
        for _ in range(n):
            j = int(sampler.rng.integers(0, len(sampler.factor_sizes)))
            fixed = sampler.sample_factors(batch_size)
            fixed[:, j] = fixed[0, j]
            obs = sampler.observations_from_factors(fixed)
            rep = np.asarray(repr_fn(obs))
            local_var = np.var(rep, axis=0, ddof=1)
            argmin = int(np.argmin(
                np.where(active, local_var / np.maximum(global_var, 1e-11),
                         np.inf)))
            votes[j, argmin] += 1
        return votes

    train_votes = vote(max(1, num_train))
    classifier = np.argmax(train_votes, axis=0)
    train_acc = train_votes[classifier, np.arange(z.shape[1])].sum() / \
        max(1, train_votes.sum())
    eval_votes = vote(max(1, num_eval))
    eval_acc = eval_votes[classifier, np.arange(z.shape[1])].sum() / \
        max(1, eval_votes.sum())
    return {"factor_vae.mean_accuracy": float(train_acc),
            "factor_vae.eval_accuracy": float(eval_acc),
            "factor_vae.num_active_dims": int(active.sum())}
