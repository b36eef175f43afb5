"""Round-5 dataset-matrix coverage (round-4 VERDICT missing item 1):
the smallNORB / sprites stand-in generators produce the CANONICAL
on-disk formats and roundtrip through the production loaders, and the
fetch watchdog (ctvae_tpu/utils/watchdog.py) detects hangs.

The full-size generators are exercised at dataset scale by bench.py's
``e2e_smallnorb_*`` / ``e2e_sprites_*`` legs; here the format contract
is pinned at test speed."""

import os
import sys
import time

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))

from ctvae_tpu.data.disent_data import (DISENT_LOADERS, FACTOR_SIZES,
                                        _read_norb_matrix)


def test_write_norb_matrix_roundtrip(tmp_path):
    """Generator's writer vs the production reader, over every dtype
    header and the '>=3 stored dims' quirk (1-D cat, 2-D info, 4-D dat
    files all pad/truncate the dim list differently)."""
    from make_smallnorb_standin import write_norb_matrix

    rng = np.random.default_rng(0)
    for arr in (rng.integers(0, 255, (7, 2, 9, 5)).astype(np.uint8),
                rng.integers(0, 5, (11,)).astype(np.int32),
                rng.integers(0, 18, (11, 4)).astype(np.int32)):
        p = tmp_path / "m.mat"
        write_norb_matrix(str(p), arr)
        back = _read_norb_matrix(str(p))
        assert back.dtype == arr.dtype and back.shape == arr.shape
        np.testing.assert_array_equal(back, arr)


def test_smallnorb_standin_format(tmp_path, monkeypatch):
    """A tiny smallNORB stand-in built with the generator's writer and
    REAL factor-value quirks (instances {4,6,7,8,9} subset, even
    azimuths, shuffled rows) loads through load_smallnorb into grid
    order."""
    from make_smallnorb_standin import PREFIX, write_norb_matrix

    sizes = (2, 2, 3, 4, 2)
    monkeypatch.setitem(FACTOR_SIZES, "smallnorb", sizes)
    cats = np.arange(2, dtype=np.int32)
    insts = np.array([4, 6], np.int32)             # training quirk
    elevs = np.arange(3, dtype=np.int32)
    azims = np.arange(0, 8, 2, dtype=np.int32)     # even quirk
    lights = np.arange(2, dtype=np.int32)
    grid = np.stack(np.meshgrid(cats, insts, elevs, azims, lights,
                                indexing="ij"), -1).reshape(-1, 5)
    n = len(grid)
    imgs = (np.arange(n, dtype=np.uint8)[:, None, None, None]
            * np.ones((n, 2, 96, 96), np.uint8))
    perm = np.random.default_rng(1).permutation(n)   # rows unsorted
    folder = tmp_path / "smallnorb"
    folder.mkdir()
    write_norb_matrix(str(folder / (PREFIX + "-dat.mat")), imgs[perm])
    write_norb_matrix(str(folder / (PREFIX + "-cat.mat")),
                      grid[perm, 0].astype(np.int32))
    write_norb_matrix(str(folder / (PREFIX + "-info.mat")),
                      grid[perm, 1:].astype(np.int32))

    ds = DISENT_LOADERS["smallnorb"](str(tmp_path), split="all")
    assert len(ds.index_map) == n
    # loader lexsorts into grid order: row i must be original image i
    got = np.array([ds.images_raw[i][0, 0] for i in range(n)])
    np.testing.assert_array_equal(got, np.arange(n) % 256)
    assert ds.factors_all.shape == (n, 5)


def test_sprites_standin_roundtrip(tmp_path):
    """ensure_sprites_standin writes an uncompressed npz the mmap fast
    path can open; every one of the 9 factors covers its full range in
    the stratified subset."""
    from make_sprites_standin import SIZES, ensure_sprites_standin

    ensure_sprites_standin(str(tmp_path), stride=4999, verbose=False)
    ds = DISENT_LOADERS["sprites"](str(tmp_path), split="all")
    assert isinstance(ds.images_raw, np.memmap)     # stored, not deflated
    fac = ds.factors_all
    assert fac.shape[1] == 9
    for i, s in enumerate(SIZES):
        vals = np.unique(fac[:, i])
        assert vals.min() >= 0 and vals.max() == s - 1, (i, vals)
        assert len(vals) == s, f"factor {i} misses values"
    img = np.asarray(ds.images_raw[0])
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert img.max() > 0                            # actually rendered


def test_watchdog_fetch(tmp_path, monkeypatch):
    from ctvae_tpu.utils.watchdog import StepHangError, watchdog_fetch

    assert watchdog_fetch(3.5, timeout_s=5.0) == 3.5

    class Hangs:
        def __float__(self):
            time.sleep(10.0)
            return 0.0

    monkeypatch.setenv("CTVAE_INCIDENT_LOG",
                       str(tmp_path / "incidents.jsonl"))
    t0 = time.time()
    with pytest.raises(StepHangError):
        watchdog_fetch(Hangs(), timeout_s=0.2, context={"step": 7})
    assert time.time() - t0 < 5.0                   # didn't wait 10 s
    rec = open(tmp_path / "incidents.jsonl").read()
    assert "fetch_hang" in rec and '"step": 7' in rec

    class Boom:
        def __float__(self):
            raise ValueError("bad scalar")

    with pytest.raises(ValueError):                 # errors forwarded
        watchdog_fetch(Boom(), timeout_s=5.0)
