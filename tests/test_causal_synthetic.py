"""TSynthetic causal-semantics tests: the synthetic transition pairs must
genuinely encode single-factor interventions (so CT-VAE training on them
is a meaningful causal task, not noise-fitting)."""

import numpy as np

from ctvae_tpu.data.datamodule import _t_synthetic
from ctvae_tpu.data.synthetic import SyntheticGridDataset


def test_grid_dataset_complete_and_deterministic():
    ds = SyntheticGridDataset(img_size=16, split="all")
    assert len(ds) == int(np.prod(ds.factor_sizes))
    # same factors => identical image (pure render function)
    ds2 = SyntheticGridDataset(img_size=16, split="all")
    np.testing.assert_array_equal(ds.images, ds2.images)
    # images differ across factor values
    assert not np.array_equal(ds.images[0], ds.images[1])


def test_transitions_are_single_factor_interventions():
    for split in ("train", "test"):
        ds = _t_synthetic(split=split, img_size=16)
        assert len(ds.transitions) > 0, split
        base = ds.dataset
        F = len(base.factor_sizes)
        local = {n: i for i, n in enumerate(base.indices)}
        for (a, b), act in zip(ds.transitions[:200], ds.actions[:200]):
            fa = base.factors[local[a]]
            fb = base.factors[local[b]]
            diff = np.nonzero(fa != fb)[0]
            assert len(diff) == 1                      # exactly one factor
            f = int(diff[0])
            direction = int(fb[f] < fa[f])             # 1 = decreasing
            assert abs(int(fb[f]) - int(fa[f])) == 1   # adjacent values
            expected = np.zeros(2 * F, np.float32)
            expected[direction * F + f] = 1.0
            np.testing.assert_array_equal(act, expected)


def test_action_batches_available_in_test_split():
    """The CLI round trip (apply_action) needs at least one full action
    batch in the test split."""
    ds = _t_synthetic(split="test", img_size=16)
    assert len(ds.transitions) >= 8
