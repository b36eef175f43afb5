"""VAEDataset — the data module (registry + loaders), host-side numpy with
sharded device-put, replacing the reference's LightningDataModule +
torch DataLoader stack (/root/reference/dataset.py:14-166).

Registry names match the reference exactly (dataset.py:14-27), plus a
``Synthetic``/``TSynthetic`` pair used by tests and benches.

Batch dtype contract (enforced in data/prefetch.py): the ONLY keys a
loader may emit as uint8 are the [0,255] image payloads ``image`` and
``input_y`` (they ride the ``device_normalize`` fast path and get the
/255 on device). Every other key must carry its semantic dtype at the
dataset boundary — float32 actions, int64 labels — or prefetch raises.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional, Sequence, Union

import numpy as np

from .celeba import MyCelebA, TCeleba
from .disent_data import DISENT_LOADERS, FACTOR_NAMES
from .oxford import OxfordPets
from .synthetic import SyntheticDataset
from .transforms import StandardTransform
from .transition import TransitionBatchScheduler, TransitionDataset


def _disent(name):
    def factory(data_dir, split="train", transform=None, **kw):
        return DISENT_LOADERS[name](data_dir, split=split,
                                    transform=transform, **kw)
    return factory


def _t_disent(name):
    nv = len(FACTOR_NAMES[name])

    def factory(data_dir, split="train", transform=None, **kw):
        base = DISENT_LOADERS[name](data_dir, split=split,
                                    transform=transform, **kw)
        return TransitionDataset(base, num_variations=nv)
    return factory


class _SyntheticAdapter(SyntheticDataset):
    """Synthetic dataset with a vectorized get_batch + factors."""

    def __init__(self, data_dir="", split="train", transform=None, n=512,
                 img_size=64, **kw):
        super().__init__(n=n, split=split, img_size=img_size)
        self._full_data = self

    def get_batch(self, idxs):
        idxs = np.asarray(idxs)
        return self.images[idxs], self.factors[idxs]


def _t_synthetic(data_dir="", split="train", transform=None, img_size=64,
                 factor_sizes=None, split_cuts=None, **kw):
    """True causal transition dataset over the synthetic factor grid:
    pairs differ in exactly one factor, the action names it — so CT-VAE
    can genuinely learn (and tests can measure) causal structure, unlike
    random pairings (transitions built in-memory, no variation_attrs
    file needed). ``factor_sizes`` (data_params passthrough) scales the
    grid; default (5, 5, 3, 4) = 300 images. ``split_cuts`` moves the
    train/valid/test boundaries (see SyntheticGridDataset)."""
    from .synthetic import GRID_FACTOR_SIZES, SyntheticGridDataset
    base = SyntheticGridDataset(
        img_size=img_size, split=split,
        factor_sizes=tuple(factor_sizes or GRID_FACTOR_SIZES),
        split_cuts=tuple(split_cuts or (0.7, 0.85)))
    ds = TransitionDataset.__new__(TransitionDataset)
    ds.dataset = base
    ds.num_variations = len(base.factor_sizes)
    ds.split = split
    ds.root = ""
    ds.base_folder = ""
    ds.indices = base.indices
    ds._index_of = {n: i for i, n in enumerate(base.indices)}
    ds._full_data = base
    ds.transitions, ds.actions = base.causal_transitions()
    return ds


DATASETS: Dict[str, Callable] = {
    "Celeba": MyCelebA,
    "TCeleba": TCeleba,
    "Cars3D": _disent("cars3d"),
    "TCars3D": _t_disent("cars3d"),
    "DSprites": _disent("dsprites"),
    "TDSprites": _t_disent("dsprites"),
    "SmallNORB": _disent("smallnorb"),
    "TSmallNORB": _t_disent("smallnorb"),
    "Shapes3D": _disent("3dshapes"),
    "TShapes3D": _t_disent("3dshapes"),
    "Sprites": _disent("sprites"),
    "TSprites": _t_disent("sprites"),
    "OxfordPets": OxfordPets,
    "Synthetic": _SyntheticAdapter,
    "TSynthetic": _t_synthetic,
}


def _plain_batches(ds, batch_size: int, shuffle: bool, seed: int,
                   epoch: int, drop_last: bool = True):
    n = len(ds)
    rng = np.random.default_rng((seed, epoch))
    idx = rng.permutation(n) if shuffle else np.arange(n)
    n_full = n // batch_size
    for b in range(n_full):
        chunk = idx[b * batch_size:(b + 1) * batch_size]
        if hasattr(ds, "get_batch"):
            imgs, labels = ds.get_batch(chunk)
        else:
            pairs = [ds[int(i)] for i in chunk]
            imgs = np.stack([p[0] for p in pairs])
            labels = np.stack([np.asarray(p[1]) for p in pairs])
        yield {"image": imgs, "labels": labels}


class VAEDataset:
    """Args mirror the reference VAEDataset (dataset.py:45-68); torch-only
    knobs (num_workers, pin_memory) are accepted and ignored."""

    def __init__(self, data_path: str, dataset_name: str = "Celeba",
                 train_batch_size: int = 8, val_batch_size: int = 8,
                 patch_size: Union[int, Sequence[int]] = (64, 64),
                 num_workers: int = 0, pin_memory: bool = False,
                 limit: Optional[int] = None, val_limit: Optional[int] = None,
                 distributed: bool = True,
                 seed: int = 0, host_id: Optional[int] = None,
                 num_hosts: Optional[int] = None, **kwargs):
        self.data_dir = data_path
        self.dataset_name = dataset_name
        self.train_batch_size = train_batch_size
        self.val_batch_size = val_batch_size
        self.patch_size = patch_size
        self.limit = limit
        # extension over the reference (which limits only the train
        # sampler, dataset.py:96-131): cap validation batches too — used
        # by tests/CI where full validation sweeps are too slow
        self.val_limit = val_limit
        self.seed = seed
        self.extra = kwargs
        # Multi-host input sharding: each host gets an interleaved subset
        # of whole batches (the reference shards batch meta-indices with a
        # DistributedSampler, transition.py:175-178). `distributed: False`
        # gives every host the full stream, like the reference knob
        # (dataset.py:56,68).
        if distributed:
            if host_id is None or num_hosts is None:
                import jax
                host_id = jax.process_index()
                num_hosts = jax.process_count()
            self.host_id, self.num_hosts = host_id, num_hosts
        else:
            self.host_id, self.num_hosts = 0, 1

    def setup(self, stage: Optional[str] = None) -> None:
        transform = StandardTransform(self.patch_size, crop=148)
        factory = DATASETS[self.dataset_name]
        if "Synthetic" in self.dataset_name:
            ps = self.patch_size
            self.extra.setdefault(
                "img_size", ps if isinstance(ps, int) else ps[0])
        self.train_dataset = factory(self.data_dir, split="train",
                                     transform=transform, **self.extra)
        self.val_dataset = factory(self.data_dir, split="test",
                                   transform=transform, **self.extra)

    def _loader(self, ds, batch_size, shuffle, epoch):
        if isinstance(ds, TransitionDataset):
            sched = TransitionBatchScheduler(
                ds, batch_size=batch_size, shuffle=shuffle, drop_last=True,
                limit=self.limit if shuffle else self.val_limit,
                seed=self.seed,
                host_id=self.host_id, num_hosts=self.num_hosts)
            for mode, idxs in sched.epoch(epoch):
                batch = ds.get_batch(idxs, mode)
                batch["mode"] = mode
                yield batch
        else:
            batches = _plain_batches(ds, batch_size, shuffle, self.seed,
                                     epoch)
            for i, batch in enumerate(batches):
                if i % self.num_hosts != self.host_id:
                    continue
                batch["mode"] = "base"
                yield batch

    def train_dataloader(self, epoch: int = 0) -> Iterator[dict]:
        return self._loader(self.train_dataset, self.train_batch_size, True,
                            epoch)

    def val_dataloader(self, epoch: int = 0) -> Iterator[dict]:
        return self._loader(self.val_dataset, self.val_batch_size, False,
                            epoch)

    def test_dataloader(self, epoch: int = 0) -> Iterator[dict]:
        return self._loader(self.val_dataset, self.val_batch_size, True,
                            epoch)

    def steps_per_epoch(self) -> int:
        ds = self.train_dataset
        if isinstance(ds, TransitionDataset):
            return TransitionBatchScheduler(
                ds, batch_size=self.train_batch_size,
                limit=self.limit, seed=self.seed,
                host_id=self.host_id,
                num_hosts=self.num_hosts).batches_per_epoch()
        return len(ds) // self.train_batch_size // self.num_hosts
