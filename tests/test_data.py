"""Data layer tests: transforms, transition wrapper invariants, the
mode-homogeneous batch scheduler (property tests the reference lacked,
SURVEY.md §4), and the datamodule end-to-end on the synthetic dataset."""

import numpy as np
import pytest

from ctvae_tpu.data import (DATASETS, StandardTransform,
                            TransitionBatchScheduler, VAEDataset,
                            center_crop)
from ctvae_tpu.data.datamodule import _t_synthetic


def test_center_crop_pads_like_torchvision():
    img = np.ones((64, 64, 1), np.float32)
    out = center_crop(img, 148)
    assert out.shape == (148, 148, 1)
    assert out.sum() == 64 * 64       # zero padding around
    top = (148 - 64) // 2
    assert out[top, top, 0] == 1.0
    # crop when larger
    big = np.random.default_rng(0).uniform(size=(218, 178, 3)).astype(np.float32)
    out2 = center_crop(big, 148)
    assert out2.shape == (148, 148, 3)
    np.testing.assert_array_equal(out2, big[35:183, 15:163])


def test_standard_transform_shapes():
    t = StandardTransform(64, crop=148)
    out = t(np.random.default_rng(0).integers(
        0, 255, (218, 178, 3)).astype(np.uint8))
    assert out.shape == (64, 64, 3)
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_transition_virtual_index_space():
    ds = _t_synthetic(split="train", n=64)
    ld, lt = len(ds.dataset), len(ds.transitions)
    assert len(ds) == ld + 2 * lt
    x, y, opts = ds[0]
    assert opts["mode"] == "base"
    x, y, opts = ds[ld]
    assert opts["mode"] == "action"
    assert opts["action"].shape == (8,)
    assert opts["input_y"].shape == x.shape
    x, y, opts = ds[ld + lt]
    assert opts["mode"] == "causal"


def test_scheduler_mode_homogeneous_and_deterministic():
    ds = _t_synthetic(split="train", n=128)
    sched = TransitionBatchScheduler(ds, batch_size=8, seed=3)
    ranges = ds.mode_ranges()
    seen_modes = set()
    batches1 = list(sched.epoch(0))
    for mode, idxs in batches1:
        assert len(idxs) == 8
        assert all(int(i) in ranges[mode] for i in idxs), mode
        seen_modes.add(mode)
    assert seen_modes == {"base", "action", "causal"}
    # deterministic given (seed, epoch); different across epochs
    batches2 = list(sched.epoch(0))
    assert all((m1 == m2 and np.array_equal(i1, i2))
               for (m1, i1), (m2, i2) in zip(batches1, batches2))
    batches3 = list(sched.epoch(1))
    assert any(m1 != m3 or not np.array_equal(i1, i3)
               for (m1, i1), (m3, i3) in zip(batches1, batches3))


def test_scheduler_host_sharding_same_mode_disjoint_slices():
    """Multi-host SPMD invariant: at every step ALL hosts get the same
    mode (one jitted program), with disjoint slices of one global batch
    (unlike the reference's DistributedSampler, which lets ranks diverge
    in mode and therefore needs DDP find_unused_parameters)."""
    ds = _t_synthetic(split="train", n=256)
    H, BS = 4, 4
    shards = [list(TransitionBatchScheduler(
        ds, batch_size=BS, seed=1, host_id=h, num_hosts=H).epoch(0))
        for h in range(H)]
    n_steps = len(shards[0])
    assert all(len(s) == n_steps for s in shards)
    assert n_steps == TransitionBatchScheduler(
        ds, batch_size=BS, seed=1, num_hosts=H).batches_per_epoch()
    ranges = ds.mode_ranges()
    for t in range(n_steps):
        modes = {shards[h][t][0] for h in range(H)}
        assert len(modes) == 1, f"mode divergence at step {t}: {modes}"
        mode = modes.pop()
        union = np.concatenate([shards[h][t][1] for h in range(H)])
        assert len(union) == H * BS
        assert len(np.unique(union)) == H * BS          # disjoint
        assert all(int(i) in ranges[mode] for i in union)


def test_vaedataset_end_to_end_synthetic():
    dm = VAEDataset(data_path="", dataset_name="TSynthetic",
                    train_batch_size=8, val_batch_size=8, patch_size=64)
    dm.setup()
    n_batches = 0
    modes = set()
    for batch in dm.train_dataloader(epoch=0):
        assert batch["image"].shape == (8, 64, 64, 3)
        modes.add(batch["mode"])
        if batch["mode"] != "base":
            assert batch["input_y"].shape == (8, 64, 64, 3)
            assert batch["action"].shape == (8, 8)
        n_batches += 1
    assert n_batches == dm.steps_per_epoch()
    assert modes == {"base", "action", "causal"}

    dm2 = VAEDataset(data_path="", dataset_name="Synthetic",
                     train_batch_size=16, val_batch_size=16)
    dm2.setup()
    batch = next(iter(dm2.train_dataloader()))
    assert batch["image"].shape == (16, 64, 64, 3)
    assert batch["mode"] == "base"


def test_tsynthetic_factor_sizes_passthrough():
    """data_params.factor_sizes scales the synthetic causal grid (the
    knob used to grow the causal-learning benchmark past the default
    300-image grid)."""
    dm = VAEDataset(data_path="", dataset_name="TSynthetic",
                    train_batch_size=8, patch_size=16,
                    factor_sizes=[4, 4, 2, 3])
    dm.setup()
    base = dm.train_dataset._full_data
    assert base.factor_sizes == (4, 4, 2, 3)
    # actions stay 2F-dim one-hots regardless of grid size
    assert dm.train_dataset.actions.shape[1] == 8
    assert len(base) == int(4 * 4 * 2 * 3 * 0.7)


def test_registry_names_match_reference():
    expected = {"Celeba", "TCeleba", "Cars3D", "TCars3D", "DSprites",
                "TDSprites", "SmallNORB", "TSmallNORB", "Shapes3D",
                "TShapes3D", "Sprites", "TSprites"}
    assert expected.issubset(set(DATASETS))
