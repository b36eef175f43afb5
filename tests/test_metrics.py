"""Disentanglement metric sanity: a perfectly disentangled representation
must score near 1 (DCI/MIG/FactorVAE) and far above a random one."""

import numpy as np
import pytest

from ctvae_tpu.data.disent_data import ArrayFactorDataset
from ctvae_tpu.data.transforms import StandardTransform
from ctvae_tpu.metrics import GroundTruthSampler, Metric, MetricSet


def _grid_dataset():
    sizes = (4, 4, 4)
    grid = np.indices(sizes).reshape(3, -1).T          # [64, 3] row-major
    # image pixel values deterministically encode the factors
    imgs = np.zeros((len(grid), 8, 8, 1), np.float32)
    imgs[:, 0, 0, 0] = grid[:, 0] / 4.0
    imgs[:, 0, 1, 0] = grid[:, 1] / 4.0
    imgs[:, 0, 2, 0] = grid[:, 2] / 4.0
    return ArrayFactorDataset(imgs, grid, sizes, data_dir="/nonexistent",
                              base_folder="x", split="all",
                              transform=lambda im: im)


def _perfect_repr(x):
    # read the factors straight out of the pixels + tiny noise
    z = x[:, 0, :3, 0] * 4.0
    return z + np.random.default_rng(0).normal(0, 0.01, z.shape)


def _random_repr(x):
    return np.random.default_rng(1).normal(size=(x.shape[0], 3))


def test_perfect_representation_scores_high():
    ds = _grid_dataset()
    sampler = GroundTruthSampler(ds, rng=np.random.default_rng(0))
    m = MetricSet(["DCI", "MIG", "SAP", "FactorVaeScore"], sampler,
                  batch_size=32, num_train=400, num_test=200)
    res = m.compute(_perfect_repr)
    assert res["dci.disentanglement"] > 0.8, res
    assert res["mig.discrete_score"] > 0.6, res
    assert res["factor_vae.mean_accuracy"] > 0.8, res
    assert res["sap.score"] > 0.3, res


def test_random_representation_scores_low():
    ds = _grid_dataset()
    sampler = GroundTruthSampler(ds, rng=np.random.default_rng(0))
    res = Metric("MIG", sampler, batch_size=32, num_train=400).compute(
        _random_repr)
    assert res["mig.discrete_score"] < 0.2, res


def _one_factor_dataset(k=4):
    grid = np.arange(k).reshape(-1, 1)
    imgs = np.zeros((k, 8, 8, 1), np.float32)
    imgs[:, 0, 0, 0] = grid[:, 0] / k
    return ArrayFactorDataset(imgs, grid, (k,), data_dir="/nonexistent",
                              base_folder="x", split="all",
                              transform=lambda im: im)


def test_mig_analytic_exact():
    """z = (exact factor copy, constant): MI(z0,f)=H(f), MI(z1,f)=0, so
    the normalized top-1/top-2 gap is exactly 1 (disentanglement_lib
    mig.py semantics)."""
    from ctvae_tpu.metrics.disentanglement import metric_mig

    ds = _one_factor_dataset()
    sampler = GroundTruthSampler(ds, rng=np.random.default_rng(0))

    def repr_fn(x):
        f = x[:, 0, 0, 0] * 4.0
        return np.stack([f, np.zeros_like(f)], axis=1)

    res = metric_mig(sampler, repr_fn, num_train=300, batch_size=50)
    assert res["mig.discrete_score"] == pytest.approx(1.0, abs=1e-12)


def test_dci_scores_golden():
    """Entropy formulas on hand-built importance matrices: a permutation
    matrix is perfectly disentangled AND complete; a uniform matrix is
    neither (disentanglement_lib dci.py)."""
    from ctvae_tpu.metrics.disentanglement import _dci_scores

    d, c = _dci_scores(np.eye(4))
    assert d == pytest.approx(1.0, abs=1e-9)
    assert c == pytest.approx(1.0, abs=1e-9)
    d, c = _dci_scores(np.full((4, 4), 0.25))
    assert d == pytest.approx(0.0, abs=1e-9)
    assert c == pytest.approx(0.0, abs=1e-9)
    # scaling the matrix must not change either score
    rng = np.random.default_rng(0)
    m = rng.uniform(size=(5, 3))
    assert _dci_scores(m) == pytest.approx(_dci_scores(m * 7.3))


def test_factor_vae_one_vote_per_point():
    """disentanglement_lib factor_vae.py casts ONE vote per train/eval
    point, each from its own fixed-factor batch — so the sampler must
    be hit num_train + num_eval times beyond the variance estimate, and
    a perfect representation classifies every vote correctly."""
    from ctvae_tpu.metrics.disentanglement import metric_factor_vae

    ds = _grid_dataset()

    class CountingSampler(GroundTruthSampler):
        calls = 0

        def observations_from_factors(self, factors):
            CountingSampler.calls += 1
            return super().observations_from_factors(factors)

    sampler = CountingSampler(ds, rng=np.random.default_rng(0))
    res = metric_factor_vae(sampler, _perfect_repr, num_train=7,
                            num_eval=5, batch_size=8,
                            num_variance_estimate=32)
    # 1 call for the variance estimate + one per vote
    assert CountingSampler.calls == 1 + 7 + 5
    assert res["factor_vae.mean_accuracy"] == pytest.approx(1.0)
    assert res["factor_vae.eval_accuracy"] == pytest.approx(1.0)
    assert res["factor_vae.num_active_dims"] == 3


def test_factor_to_index_row_major():
    ds = _grid_dataset()
    f = np.array([[1, 2, 3], [0, 0, 0], [3, 3, 3]])
    idx = ds.factor_to_index(f)
    np.testing.assert_array_equal(idx, [1 * 16 + 2 * 4 + 3, 0, 63])


def test_procedural_dataset_fixed_factor_sampling():
    """A dataset without a complete grid but with a procedural
    ``observations_from_factors`` (the bundled Synthetic dataset) must
    support every metric, including the fixed-factor FactorVAE score."""
    from ctvae_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(n=64, img_size=16, split="train")
    sampler = GroundTruthSampler(ds, rng=np.random.default_rng(0))
    f = sampler.sample_factors(5)
    obs = sampler.observations_from_factors(f)
    assert obs.shape == (5, 16, 16, 3)
    # rendering is deterministic: same factors -> same observations
    np.testing.assert_array_equal(obs,
                                  sampler.observations_from_factors(f))

    def repr_fn(x):
        # factors are readable from the rect position/value: use mean
        # pooled pixels as a cheap representation
        return x.reshape(x.shape[0], -1)[:, ::37]

    res = MetricSet(["MIG", "FactorVaeScore"], sampler, batch_size=16,
                    num_train=64, num_test=32).compute(repr_fn)
    for k, v in res.items():
        assert np.isfinite(v), (k, v)
