"""File-format tests for every disent-family loader: write tiny synthetic
datasets in each CANONICAL on-disk format (dsprites npz, 3dshapes h5,
cars3d .mat grid, smallNORB binary matrices, sprites npz), then load
through DISENT_LOADERS and check shapes, factor alignment, and splits."""

import os
import struct

import numpy as np
import pytest

from ctvae_tpu.data.disent_data import (DISENT_LOADERS, FACTOR_SIZES,
                                        _read_norb_matrix)


def _ident(im):
    return np.asarray(im, np.float32)


# ---------------------------------------------------------------------------
# dsprites — npz with imgs + latents_classes
# ---------------------------------------------------------------------------

def test_dsprites_loader(tmp_path, monkeypatch):
    sizes = (2, 2, 3, 2, 2)   # tiny stand-in, same key layout
    monkeypatch.setitem(FACTOR_SIZES, "dsprites", sizes)
    n = int(np.prod(sizes))
    grid = np.indices(sizes).reshape(len(sizes), -1).T
    imgs = np.zeros((n, 8, 8), np.uint8)
    imgs[np.arange(n), 0, 0] = 1          # pixel encodes the index
    latents_classes = np.concatenate(
        [np.zeros((n, 1), np.int64), grid], axis=1)  # col 0 = color
    folder = tmp_path / "dsprites"
    folder.mkdir()
    np.savez(folder / "dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz",
             imgs=imgs, latents_classes=latents_classes)
    ds = DISENT_LOADERS["dsprites"](str(tmp_path), split="all",
                                    transform=_ident)
    assert len(ds) == n
    x, f = ds[5]
    # channel dim is added by the real transform (to_float); the identity
    # transform sees the raw [H, W] uint8 image scaled to 0/255
    assert x.shape == (8, 8)
    np.testing.assert_array_equal(f, grid[5])
    assert x.max() == 255.0  # binary {0,1} scaled to uint8 255


# ---------------------------------------------------------------------------
# 3dshapes — h5 with images + labels (continuous label values)
# ---------------------------------------------------------------------------

def test_shapes3d_loader(tmp_path, monkeypatch):
    h5py = pytest.importorskip("h5py")
    sizes = (2, 2, 2, 2, 2, 2)
    monkeypatch.setitem(FACTOR_SIZES, "3dshapes", sizes)
    n = int(np.prod(sizes))
    grid = np.indices(sizes).reshape(len(sizes), -1).T
    # continuous label values per factor (like hue in [0,1])
    values = [np.linspace(0.0, 1.0, s) for s in sizes]
    labels = np.stack([values[j][grid[:, j]] for j in range(6)], axis=1)
    imgs = np.zeros((n, 8, 8, 3), np.uint8)
    folder = tmp_path / "3dshapes"
    folder.mkdir()
    with h5py.File(folder / "3dshapes.h5", "w") as f:
        f["images"] = imgs
        f["labels"] = labels
    ds = DISENT_LOADERS["3dshapes"](str(tmp_path), split="all",
                                    transform=_ident)
    assert len(ds) == n
    _, f0 = ds[9]
    np.testing.assert_array_equal(f0, grid[9])


# ---------------------------------------------------------------------------
# cars3d — nips2015-analogy .mat files, [128,128,3,24,4] per car
# ---------------------------------------------------------------------------

def test_cars3d_loader(tmp_path, monkeypatch):
    scipy_io = pytest.importorskip("scipy.io")
    n_cars = 3
    monkeypatch.setitem(FACTOR_SIZES, "cars3d", (4, 24, n_cars))
    folder = tmp_path / "cars3d" / "cars"
    folder.mkdir(parents=True)
    for c in range(n_cars):
        im = np.full((128, 128, 3, 24, 4), c, np.uint8)
        for e in range(4):
            for a in range(24):
                im[0, 0, 0, a, e] = e * 24 + a   # encode (elev, azim)
        scipy_io.savemat(folder / f"car_{c:03d}_mesh.mat", {"im": im})
    ds = DISENT_LOADERS["cars3d"](str(tmp_path), split="all",
                                  transform=_ident)
    assert len(ds) == 4 * 24 * n_cars
    # row-major ordering (elevation, azimuth, car)
    x, f = ds[(1 * 24 + 5) * n_cars + 2]      # elev 1, azim 5, car 2
    np.testing.assert_array_equal(f, [1, 5, 2])
    assert x[0, 0, 1] == 2.0                   # car id in every pixel
    assert x[0, 0, 0] == 1 * 24 + 5            # encoded view id


# ---------------------------------------------------------------------------
# smallNORB — custom little-endian binary matrices
# ---------------------------------------------------------------------------

def _write_norb(path, arr, magic):
    with open(path, "wb") as f:
        f.write(struct.pack("<i", magic))
        f.write(struct.pack("<i", arr.ndim))
        for d in range(max(arr.ndim, 3)):
            f.write(struct.pack("<i", arr.shape[d] if d < arr.ndim else 1))
        f.write(arr.tobytes())


def test_read_norb_matrix_roundtrip(tmp_path):
    arr = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    p = str(tmp_path / "m.mat")
    _write_norb(p, arr, 0x1E3D4C55)
    out = _read_norb_matrix(p)
    np.testing.assert_array_equal(out, arr)
    arr32 = np.arange(6, dtype=np.int32).reshape(2, 3)
    p2 = str(tmp_path / "m2.mat")
    _write_norb(p2, arr32, 0x1E3D4C54)
    np.testing.assert_array_equal(_read_norb_matrix(p2), arr32)


def test_smallnorb_loader(tmp_path, monkeypatch):
    sizes = (2, 2, 2, 2, 2)
    monkeypatch.setitem(FACTOR_SIZES, "smallnorb", sizes)
    n = int(np.prod(sizes))
    grid = np.indices(sizes).reshape(len(sizes), -1).T
    rng = np.random.default_rng(0)
    perm = rng.permutation(n)                  # file rows NOT factor-sorted
    dat = np.zeros((n, 2, 8, 8), np.uint8)
    dat[np.arange(n), 0, 0, 0] = perm.argsort().argsort()  # unused marker
    cat = grid[perm, 0].astype(np.int32)
    info = np.stack([grid[perm, 1], grid[perm, 2], grid[perm, 3],
                     grid[perm, 4]], axis=1).astype(np.int32)
    folder = tmp_path / "smallnorb"
    folder.mkdir()
    prefix = str(folder / "smallnorb-5x46789x9x18x6x2x96x96-training")
    _write_norb(prefix + "-dat.mat", dat, 0x1E3D4C55)
    _write_norb(prefix + "-cat.mat", cat, 0x1E3D4C54)
    _write_norb(prefix + "-info.mat", info, 0x1E3D4C54)
    ds = DISENT_LOADERS["smallnorb"](str(tmp_path), split="all",
                                     transform=_ident)
    assert len(ds) == n
    # loader must lexsort rows into row-major factor order
    _, f = ds[3]
    np.testing.assert_array_equal(f, grid[3])


# ---------------------------------------------------------------------------
# sprites — consolidated npz
# ---------------------------------------------------------------------------

def test_sprites_loader(tmp_path, monkeypatch):
    sizes = (2, 2, 1, 1, 1, 1, 2, 1, 2)
    monkeypatch.setitem(FACTOR_SIZES, "sprites", sizes)
    n = int(np.prod(sizes))
    grid = np.indices(sizes).reshape(len(sizes), -1).T
    folder = tmp_path / "sprites"
    folder.mkdir()
    np.savez(folder / "sprites.npz",
             images=np.zeros((n, 8, 8, 3), np.uint8), factors=grid)
    ds = DISENT_LOADERS["sprites"](str(tmp_path), split="all",
                                   transform=_ident)
    assert len(ds) == n
    _, f = ds[7]
    np.testing.assert_array_equal(f, grid[7])


def test_cache_transformed_matches_live_path(tmp_path, monkeypatch):
    sizes = (2, 2, 3)
    monkeypatch.setitem(FACTOR_SIZES, "dsprites", sizes)
    n = int(np.prod(sizes))
    grid = np.indices(sizes).reshape(len(sizes), -1).T
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 2, (n, 64, 64)).astype(np.uint8)
    latents_classes = np.concatenate(
        [np.zeros((n, 1), np.int64), grid], axis=1)
    folder = tmp_path / "dsprites"
    folder.mkdir()
    np.savez(folder / "dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz",
             imgs=imgs, latents_classes=latents_classes)
    from ctvae_tpu.data.transforms import StandardTransform
    t = StandardTransform(32, crop=148)
    live = DISENT_LOADERS["dsprites"](str(tmp_path), split="all", transform=t)
    cached = DISENT_LOADERS["dsprites"](str(tmp_path), split="all",
                                        transform=t, cache_transformed=True)
    idxs = np.arange(n)
    a, fa = live.get_batch(idxs)
    b, fb = cached.get_batch(idxs)
    np.testing.assert_array_equal(fa, fb)
    # uint8 round trip costs at most 1/255 per pixel
    assert np.abs(a - b).max() <= 1.0 / 255.0 + 1e-6

    # the cache persists on disk next to the dataset artifacts, and a
    # second construction memory-maps it (identical batches, no rebuild)
    cache_file = cached._cache_path()
    assert cache_file and os.path.exists(cache_file)
    reloaded = DISENT_LOADERS["dsprites"](str(tmp_path), split="all",
                                          transform=t,
                                          cache_transformed=True)
    assert isinstance(reloaded._cache, np.memmap)
    c, fc = reloaded.get_batch(idxs)
    np.testing.assert_array_equal(np.asarray(b), np.asarray(c))
    np.testing.assert_array_equal(fb, fc)


def test_device_normalize_matches_host_path(tmp_path, monkeypatch):
    """data_params.device_normalize ships uint8 batches and converts on
    device after the H2D copy (4x less transfer) — values must match the
    host-side float path through the real prefetch pipeline to within
    one float32 ulp (XLA lowers /255 to a reciprocal multiply)."""
    sizes = (2, 2, 4)
    monkeypatch.setitem(FACTOR_SIZES, "dsprites", sizes)
    n = int(np.prod(sizes))
    grid = np.indices(sizes).reshape(len(sizes), -1).T
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 2, (n, 64, 64)).astype(np.uint8)
    latents_classes = np.concatenate(
        [np.zeros((n, 1), np.int64), grid], axis=1)
    folder = tmp_path / "dsprites"
    folder.mkdir()
    np.savez(folder / "dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz",
             imgs=imgs, latents_classes=latents_classes)
    from ctvae_tpu.data.transforms import StandardTransform
    t = StandardTransform(32, crop=148)
    host = DISENT_LOADERS["dsprites"](str(tmp_path), split="all",
                                      transform=t, cache_transformed=True)
    dev = DISENT_LOADERS["dsprites"](str(tmp_path), split="all",
                                     transform=t, device_normalize=True)
    idxs = np.arange(n)
    a, fa = host.get_batch(idxs)
    b_u8, fb = dev.get_batch(idxs)
    assert a.dtype == np.float32 and b_u8.dtype == np.uint8
    np.testing.assert_array_equal(fa, fb)

    from ctvae_tpu.data.prefetch import prefetch_to_device
    from ctvae_tpu.parallel import make_mesh
    mesh = make_mesh()
    (out,) = list(prefetch_to_device(
        iter([{"image": b_u8, "mode": "base"}]), mesh))
    converted = np.asarray(out["image"])
    assert converted.dtype == np.float32
    np.testing.assert_allclose(converted, a, rtol=0, atol=6e-8)
