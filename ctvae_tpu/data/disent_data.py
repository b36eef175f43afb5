"""Native loaders for the disent-family factor datasets.

The reference delegates to the ``disent`` library
(/root/reference/datasets/disent_dataset.py:17-113) which downloads and
wraps cars3d / dsprites / smallnorb / 3dshapes / sprites. This module
reads the SAME canonical on-disk artifacts natively (no disent, no
downloads — ``prepare`` is a no-op that just validates presence):

* dsprites — ``dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz``
* 3dshapes — ``3dshapes.h5`` (images uint8 [N,64,64,3], labels [N,6])
* cars3d   — ``cars/*.mat`` (nips2015-analogy-data, 24x4 views per car)
* smallnorb — the 4 ``*-{dat,cat,info}.mat`` binary matrices
* sprites  — ``sprites.npz`` with ``images`` [N,H,W,C] + ``factors``
  [N,9] arrays (a preprocessed consolidation of the upstream
  ``npy_tensor/*.npy`` per-action frame tensors; consolidate offline
  once, same information)

Every loader exposes the adapter surface the transition wrapper expects
(``split`` / ``root`` / ``base_folder`` / ``indices``, reference
transition.py:29-49), plus ``factors`` + ``factor_sizes`` for the
disentanglement metrics and a vectorized ``get_batch``.

Splits come from ``list_eval_partition.txt`` exactly like the reference
(:56-66): rows of (_, index, split) with 0/1/2 = train/valid/test.
"""

from __future__ import annotations

import csv
import os
from typing import Callable, List, Optional, Tuple

import numpy as np

from .transforms import StandardTransform

FACTOR_NAMES = {
    "cars3d": ("elevation", "azimuth", "object_type"),
    "dsprites": ("shape", "scale", "orientation", "position_x", "position_y"),
    "smallnorb": ("category", "instance", "elevation", "rotation", "lighting"),
    "3dshapes": ("floor_hue", "wall_hue", "object_hue", "scale", "shape",
                 "orientation"),
    "sprites": ("bottomwear", "topwear", "hair", "eyes", "shoes", "body",
                "action", "rotation", "frame"),
}

FACTOR_SIZES = {
    "cars3d": (4, 24, 183),
    "dsprites": (3, 6, 40, 32, 32),
    "smallnorb": (5, 5, 9, 18, 6),
    "3dshapes": (10, 10, 10, 8, 4, 15),
    "sprites": (7, 7, 10, 5, 3, 4, 9, 4, 6),
}


def _open_npz_member_mmap(path: str, key: str) -> np.ndarray:
    """True memory-map of an UNCOMPRESSED ``.npz`` member (``np.savez``).

    ``np.load(..., mmap_mode=...)`` silently ignores mmap for npz
    archives — ``z[key]`` reads the whole member (~36 s for the 3 GB
    dsprites array on this host), paid once per dataset instance. A
    stored (non-deflated) zip member is just the raw ``.npy`` bytes at a
    fixed offset, so it can be mapped directly: parse the npy header via
    the zip stream, locate the member's data offset from its local file
    header, and ``np.memmap`` the file there. Falls back to a full read
    for compressed archives or Fortran-ordered arrays."""
    import zipfile

    from numpy.lib import format as npf
    name = key + ".npy"
    with zipfile.ZipFile(path) as zf:
        info = zf.getinfo(name)
        if info.compress_type != zipfile.ZIP_STORED:
            return np.load(path, allow_pickle=True)[key]
        with zf.open(name) as f:
            version = npf.read_magic(f)
            shape, fortran, dtype = npf._read_array_header(f, version)
            header_len = f.tell()          # npy header bytes consumed
    if fortran or dtype.hasobject:
        return np.load(path, allow_pickle=True)[key]
    with open(path, "rb") as raw:
        raw.seek(info.header_offset)
        lh = raw.read(30)                  # zip local file header
        if lh[:4] != b"PK\x03\x04":
            return np.load(path, allow_pickle=True)[key]
        nlen = int.from_bytes(lh[26:28], "little")
        elen = int.from_bytes(lh[28:30], "little")
    data_off = info.header_offset + 30 + nlen + elen + header_len
    return np.memmap(path, dtype=dtype, mode="r", offset=data_off,
                     shape=shape)


def _source_fingerprint(folder: str) -> str:
    """Cheap content fingerprint of a dataset folder: sha1 over the
    sorted (relpath, size, mtime_ns) of every artifact file, excluding
    the transform caches themselves. Replacing the dataset archive with
    different content of the SAME length (e.g. swapping a stand-in for
    the real download, or regenerating a split CSV) changes this, which
    invalidates the persisted ``tcache_*`` files — a row-count check
    alone cannot see such a swap."""
    import hashlib
    h = hashlib.sha1()
    for dirpath, _, names in sorted(os.walk(folder)):
        for name in sorted(names):
            if name.startswith("tcache_"):
                continue
            p = os.path.join(dirpath, name)
            try:
                st = os.stat(p)
            except OSError:
                continue
            rel = os.path.relpath(p, folder)
            h.update(f"{rel}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    return h.hexdigest()


def _load_split_csv(path: str) -> Tuple[List[int], List[int]]:
    with open(path) as f:
        rows = list(csv.reader(f))[1:]
    return [int(r[1]) for r in rows], [int(r[2]) for r in rows]


class ArrayFactorDataset:
    """In-memory (or memmapped) images + integer factor labels.

    ``cache_transformed=True`` pre-materializes the whole transformed
    split ONCE (uint8, via the threaded native kernel) so the per-batch
    hot path is a pure gather — the SURVEY.md §7 recipe for keeping the
    host pipeline ahead of >100k img/s chips. Cost: H*W*C bytes/image
    (e.g. 5.9 GB for the full 480k-image Shapes3D at 64x64x3)."""

    def __init__(self, images: np.ndarray, factors: np.ndarray,
                 factor_sizes: Tuple[int, ...], data_dir: str,
                 base_folder: str, split: str = "train",
                 transform: Optional[Callable] = None,
                 cache_transformed: bool = False,
                 device_normalize: bool = False):
        self.images_raw = images
        self.factors_all = factors.astype(np.int64)
        self.factor_sizes = tuple(factor_sizes)
        self.root = data_dir
        self.base_folder = base_folder
        self.split = split
        self.transform = transform or StandardTransform(64)
        # _full_data: the whole (unsplit) dataset, used by metrics
        # (reference run.py:73 uses val_dataset.dataset._full_data).
        self._full_data = self

        split_file = os.path.join(data_dir, base_folder,
                                  "list_eval_partition.txt")
        n = len(images)
        if split == "all" or not os.path.exists(split_file):
            self.index_map = np.arange(n)
        else:
            idx, spl = _load_split_csv(split_file)
            want = {"train": 0, "valid": 1, "test": 2}[split]
            self.index_map = np.array(
                [i for i, s in zip(idx, spl) if s == want], np.int64)
        self.indices = [str(i) for i in self.index_map]

        # data_params.device_normalize: get_batch returns
        # the cached uint8 rows raw; the [0,1] float conversion happens
        # ON DEVICE after the host->device copy (data/prefetch.py) — 4x
        # less transfer per batch, values within one f32 ulp of the host
        # astype/255 path. Requires the transform cache.
        self.device_normalize = bool(device_normalize)
        self._cache: Optional[np.ndarray] = None
        if (cache_transformed or self.device_normalize) and isinstance(
                self.transform, StandardTransform):
            self._build_cache()

    def _cache_path(self) -> Optional[str]:
        """On-disk home for the transformed cache (next to the dataset
        artifacts, which are already host-local): one transform pass per
        (split, crop, patch) ever — later runs memory-map it in O(ms)
        instead of re-transforming the whole split (~minutes for the
        737k-image datasets)."""
        folder = os.path.join(self.root, self.base_folder)
        if not (self.root and os.path.isdir(folder)):
            return None
        ps = self.transform.patch_size
        ps = ps if isinstance(ps, int) else "x".join(map(str, ps))
        return os.path.join(
            folder, f"tcache_{self.split}_c{self.transform.crop}_{ps}.npy")

    def _build_cache(self, chunk: int = 4096) -> None:
        import json
        n = len(self.index_map)
        path = self._cache_path()
        fp = (_source_fingerprint(os.path.join(self.root, self.base_folder))
              if path else "")
        if path and os.path.exists(path):
            arr = np.load(path, mmap_mode="r")
            meta = {}
            try:
                with open(path + ".src.json") as f:
                    meta = json.load(f)
            except (OSError, ValueError):
                pass
            # stale guards: row count (split change) AND source
            # fingerprint (same-length content swap — e.g. replacing a
            # stand-in npz with the real archive serves identical n)
            if len(arr) == n and meta.get("fingerprint") == fp:
                self._cache = arr
                return
        first = self.transform.batch(
            np.stack([np.asarray(self.images_raw[int(self.index_map[0])])]))
        out = np.empty((n,) + first.shape[1:], np.uint8)
        for lo in range(0, n, chunk):
            raws = self.index_map[lo:lo + chunk]
            batch = np.stack([np.asarray(self.images_raw[int(r)])
                              for r in raws])
            out[lo:lo + len(raws)] = np.clip(
                self.transform.batch(batch) * 255.0 + 0.5, 0, 255)
        if path:
            tmp = path + f".tmp{os.getpid()}.npy"
            np.save(tmp.removesuffix(".npy"), out)
            os.replace(tmp, path)
            with open(path + ".src.json", "w") as f:
                json.dump({"fingerprint": fp, "n": n}, f)
        self._cache = out

    def __len__(self):
        return len(self.index_map)

    def _image(self, raw_idx: int) -> np.ndarray:
        return self.transform(self.images_raw[raw_idx])

    def __getitem__(self, idx: int):
        raw = int(self.index_map[idx])
        return self._image(raw), self.factors_all[raw]

    def get_batch(self, idxs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        raws = self.index_map[np.asarray(idxs)]
        if self._cache is not None and self.device_normalize:
            return self._cache[np.asarray(idxs)], self.factors_all[raws]
        if self._cache is not None:
            # fused native gather+convert when available (one pass,
            # threaded) vs numpy's gather -> astype -> divide triple pass
            from .. import native
            if native.available():
                imgs = native.gather_u8_batch(self._cache, idxs)
            else:
                imgs = (self._cache[np.asarray(idxs)]
                        .astype(np.float32) / 255.0)
            return imgs, self.factors_all[raws]
        if isinstance(self.transform, StandardTransform):
            raw_imgs = np.stack([np.asarray(self.images_raw[int(r)])
                                 for r in raws])
            return self.transform.batch(raw_imgs), self.factors_all[raws]
        imgs = np.stack([self._image(int(r)) for r in raws])
        return imgs, self.factors_all[raws]

    # -- metric support: sample observations for a given factor setting --
    def factor_to_index(self, factors: np.ndarray) -> np.ndarray:
        """Row-major factor tuple -> raw dataset index (the canonical
        ordering all of these datasets use)."""
        strides = np.cumprod((1,) + self.factor_sizes[::-1][:-1])[::-1]
        return (np.asarray(factors) * strides).sum(-1).astype(np.int64)


class _ScaledU8Rows:
    """Lazy ``arr[i] * scale`` row view: keeps the 3 GB dsprites archive
    memory-mapped instead of materializing ``imgs * 255`` for the whole
    array up front (every consumer indexes rows: the transform cache
    builder, the uncached batch path, and the metrics sampler)."""

    def __init__(self, arr, scale: int):
        self.arr = arr
        self.scale = np.uint8(scale)

    def __len__(self):
        return len(self.arr)

    @property
    def shape(self):
        return self.arr.shape

    def __getitem__(self, i):
        return np.asarray(self.arr[i]) * self.scale


def _missing(path, name):
    raise FileNotFoundError(
        f"{name} artifact not found at {path}. Place the canonical dataset "
        f"file(s) there (no network egress in this environment).")


def load_dsprites(data_dir: str, split: str = "train",
                  transform: Optional[Callable] = None, **kw):
    folder = os.path.join(data_dir, "dsprites")
    fname = "dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz"
    path = os.path.join(folder, fname)
    if not os.path.exists(path):
        _missing(path, "dsprites")
    imgs = _open_npz_member_mmap(path, "imgs")        # [737280, 64, 64] uint8{0,1}
    # latents_classes col 0 is the constant color factor; disent drops it.
    factors = np.asarray(
        _open_npz_member_mmap(path, "latents_classes"))[:, 1:]
    return ArrayFactorDataset(_ScaledU8Rows(imgs, 255), factors,
                              FACTOR_SIZES["dsprites"], data_dir, "dsprites",
                              split, transform,
                              cache_transformed=kw.get("cache_transformed",
                                                       False),
                              device_normalize=kw.get("device_normalize",
                                                      False))


def load_shapes3d(data_dir: str, split: str = "train",
                  transform: Optional[Callable] = None, **kw):
    import h5py
    folder = os.path.join(data_dir, "3dshapes")
    path = os.path.join(folder, "3dshapes.h5")
    if not os.path.exists(path):
        _missing(path, "3dshapes")
    f = h5py.File(path, "r")
    imgs = f["images"]                                # uint8 [480000,64,64,3]
    labels = f["labels"][:]                           # float [480000,6]
    sizes = FACTOR_SIZES["3dshapes"]
    factors = np.zeros((len(labels), 6), np.int64)
    for i, n in enumerate(sizes):
        vals = np.unique(labels[:, i])
        factors[:, i] = np.searchsorted(vals, labels[:, i])
    return ArrayFactorDataset(imgs, factors, sizes, data_dir, "3dshapes",
                              split, transform,
                              cache_transformed=kw.get("cache_transformed",
                                                       False),
                              device_normalize=kw.get("device_normalize",
                                                      False))


def load_cars3d(data_dir: str, split: str = "train",
                transform: Optional[Callable] = None, **kw):
    from scipy.io import loadmat
    folder = os.path.join(data_dir, "cars3d", "cars")
    if not os.path.isdir(folder):
        _missing(folder, "cars3d")
    mats = sorted(f for f in os.listdir(folder) if f.endswith(".mat"))
    ims = []
    for m in mats:
        data = loadmat(os.path.join(folder, m))["im"]  # [128,128,3,24,4]
        ims.append(data.transpose(4, 3, 0, 1, 2))      # [4,24,128,128,3]
    arr = np.stack(ims)                                # [183,4,24,...]
    arr = arr.transpose(1, 2, 0, 3, 4, 5)              # [4,24,183,...]
    images = arr.reshape(-1, 128, 128, 3)
    sizes = FACTOR_SIZES["cars3d"]
    grid = np.indices(sizes).reshape(len(sizes), -1).T
    return ArrayFactorDataset(images, grid, sizes, data_dir, "cars3d",
                              split, transform,
                              cache_transformed=kw.get("cache_transformed",
                                                       False),
                              device_normalize=kw.get("device_normalize",
                                                      False))


def _read_norb_matrix(path: str) -> np.ndarray:
    """smallNORB custom binary matrix format."""
    with open(path, "rb") as f:
        magic = int.from_bytes(f.read(4), "little")
        ndim = int.from_bytes(f.read(4), "little")
        shape = [int.from_bytes(f.read(4), "little")
                 for _ in range(max(ndim, 3))][:ndim]
        dtype = {0x1E3D4C51: np.float32, 0x1E3D4C53: np.float64,
                 0x1E3D4C54: np.int32, 0x1E3D4C55: np.uint8,
                 0x1E3D4C56: np.int16}[magic]
        return np.frombuffer(f.read(), dtype).reshape(shape)


def load_smallnorb(data_dir: str, split: str = "train",
                   transform: Optional[Callable] = None, **kw):
    folder = os.path.join(data_dir, "smallnorb")
    prefix = os.path.join(
        folder, "smallnorb-5x46789x9x18x6x2x96x96-training")
    dat_p = prefix + "-dat.mat"
    if not os.path.exists(dat_p):
        _missing(dat_p, "smallnorb")
    dat = _read_norb_matrix(dat_p)[:, 0]               # first camera
    cat = _read_norb_matrix(prefix + "-cat.mat")
    info = _read_norb_matrix(prefix + "-info.mat")
    factors = np.column_stack([cat, info[:, 0], info[:, 1], info[:, 2],
                               info[:, 3]]).astype(np.int64)
    order = np.lexsort(factors.T[::-1])
    return ArrayFactorDataset(dat[order], factors[order],
                              FACTOR_SIZES["smallnorb"], data_dir,
                              "smallnorb", split, transform,
                              cache_transformed=kw.get("cache_transformed",
                                                       False),
                              device_normalize=kw.get("device_normalize",
                                                      False))


def load_sprites(data_dir: str, split: str = "train",
                 transform: Optional[Callable] = None, **kw):
    folder = os.path.join(data_dir, "sprites")
    path = os.path.join(folder, "sprites.npz")
    if not os.path.exists(path):
        _missing(path, "sprites")
    return ArrayFactorDataset(_open_npz_member_mmap(path, "images"),
                              np.asarray(_open_npz_member_mmap(path,
                                                               "factors")),
                              FACTOR_SIZES["sprites"], data_dir, "sprites",
                              split, transform,
                              cache_transformed=kw.get("cache_transformed",
                                                       False),
                              device_normalize=kw.get("device_normalize",
                                                      False))


DISENT_LOADERS = {
    "cars3d": load_cars3d,
    "dsprites": load_dsprites,
    "smallnorb": load_smallnorb,
    "3dshapes": load_shapes3d,
    "sprites": load_sprites,
}
