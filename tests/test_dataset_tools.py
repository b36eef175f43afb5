"""Round-trip integration tests for the offline dataset tooling: build a
fake on-disk CelebA / dsprites, run the variation generators, then load
the transition datasets through the real loaders (coverage the reference
never had — its generators were only ever run by hand)."""

import csv
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# CelebA
# ---------------------------------------------------------------------------

def _fake_celeba(root, n=48, n_attrs=40):
    from PIL import Image
    folder = os.path.join(root, "celeba")
    img_dir = os.path.join(folder, "img_align_celeba")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    names = [f"{i:06d}.jpg" for i in range(1, n + 1)]
    attrs = rng.choice([-1, 1], size=(n, n_attrs))
    # ensure variation in the first 10 attrs within identical remainders:
    # make pairs identical except attr 0
    for i in range(0, n - 1, 2):
        attrs[i + 1] = attrs[i]
        attrs[i + 1, 0] = -attrs[i, 0]
    for name in names:
        arr = rng.integers(0, 255, (218, 178, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name), quality=90)
    with open(os.path.join(folder, "list_attr_celeba.txt"), "w") as f:
        f.write(f"{n}\n")
        f.write(" ".join(f"A{j}" for j in range(n_attrs)) + "\n")
        for name, row in zip(names, attrs):
            f.write(name + " " + " ".join(str(v) for v in row) + "\n")
    with open(os.path.join(folder, "list_eval_partition.txt"), "w") as f:
        for i, name in enumerate(names):
            f.write(f"{name} {0 if i < n * 3 // 4 else 2}\n")
    return folder


def test_celeba_generator_and_tceleba_roundtrip(tmp_path):
    root = str(tmp_path)
    _fake_celeba(root)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "celeba_variation_gen.py"), root],
        capture_output=True, text=True, cwd=REPO)
    assert r.returncode == 0, r.stderr
    out = os.path.join(root, "celeba", "variation_attrs_10.txt")
    assert os.path.exists(out)
    with open(out) as f:
        rows = list(csv.reader(f))[1:]
    assert len(rows) > 0
    # both directions present, source/target in {0,1}
    assert all(r[4] in "01" and r[5] in "01" for r in rows)

    from ctvae_tpu.data import DATASETS
    ds = DATASETS["TCeleba"](root, split="train")
    assert len(ds.transitions) > 0
    assert ds.actions.shape[1] == 20      # 2 * num_variations(10)
    batch = ds.get_batch(np.array([len(ds.dataset)]), "action")
    assert batch["image"].shape == (1, 64, 64, 3)
    assert batch["input_y"].shape == (1, 64, 64, 3)
    assert batch["action"].shape == (1, 20)


def test_celeba_get_batch_native_matches_getitem(tmp_path):
    root = str(tmp_path)
    _fake_celeba(root, n=8)
    from ctvae_tpu.data import DATASETS
    ds = DATASETS["Celeba"](root, split="train")
    imgs, labels = ds.get_batch(np.arange(4))
    singles = np.stack([ds[i][0] for i in range(4)])
    assert np.abs(imgs - singles).max() < 2.0 / 255.0
    np.testing.assert_array_equal(labels[0], ds[0][1])


# ---------------------------------------------------------------------------
# disent-family (dsprites-shaped fake grid)
# ---------------------------------------------------------------------------

def test_disent_generator_and_loader_roundtrip(tmp_path, monkeypatch):
    from ctvae_tpu.data import disent_data
    from scripts.disent_variation_gen import generate

    sizes = (3, 4, 5)
    monkeypatch.setitem(disent_data.FACTOR_SIZES, "fakegrid", sizes)
    root = str(tmp_path)
    generate("fakegrid", root, seed=7)

    part = os.path.join(root, "fakegrid", "list_eval_partition.txt")
    var = os.path.join(root, "fakegrid", "variation_attrs_3.txt")
    assert os.path.exists(part) and os.path.exists(var)

    with open(var) as f:
        rows = list(csv.reader(f))[1:]
    n_total = int(np.prod(sizes))
    with open(part) as f:
        split_rows = list(csv.reader(f))[1:]
    split = {int(r[1]): int(r[2]) for r in split_rows}
    assert len(split) == n_total
    # every transition: endpoints share split, adjacent factor values
    strides = np.cumprod((1,) + sizes[::-1][:-1])[::-1]
    for r in rows:
        inp, out = int(r[1]), int(r[2])
        f_id, src, tgt = int(r[3]), int(r[4]), int(r[5])
        assert split[inp] == split[out] == int(r[6])
        assert abs(src - tgt) == 1
        pos_in = [(inp // s) % d for s, d in zip(strides, sizes)]
        pos_out = [(out // s) % d for s, d in zip(strides, sizes)]
        assert pos_in[f_id] == src and pos_out[f_id] == tgt
        for j in range(len(sizes)):
            if j != f_id:
                assert pos_in[j] == pos_out[j]

    # load through ArrayFactorDataset + TransitionDataset using the files
    grid = np.indices(sizes).reshape(len(sizes), -1).T
    imgs = np.zeros((n_total, 8, 8, 1), np.uint8)
    ds = disent_data.ArrayFactorDataset(
        imgs, grid, sizes, root, "fakegrid", split="train",
        transform=lambda im: im.astype(np.float32))
    from ctvae_tpu.data import TransitionDataset
    t = TransitionDataset(ds, num_variations=len(sizes))
    assert len(t.transitions) > 0
    modes = t.mode_ranges()
    assert len(modes["action"]) == len(t.transitions)


def test_shapes3d_standin_generator(tmp_path):
    """scripts/make_shapes3d_standin.py emits the canonical 3dshapes.h5
    layout at any scale; the production `.h5` loader reads it (format
    certified tiny here, at full 480k scale by bench.py's
    e2e_shapes3d_* fields)."""
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_shapes3d_standin import ensure_shapes3d_standin

    from ctvae_tpu.data.disent_data import load_shapes3d

    root = str(tmp_path)
    sizes = (3, 2, 2, 2, 2, 3)
    p = ensure_shapes3d_standin(root, factor_sizes=sizes, verbose=False)
    assert p.endswith("3dshapes.h5")
    ensure_shapes3d_standin(root, factor_sizes=sizes, verbose=False)  # idempotent

    ds = load_shapes3d(root, split="all",
                       transform=lambda im: im.astype(np.float32) / 255.0)
    assert len(ds) == int(np.prod(sizes))
    # labels carry real factor VALUES; the loader's unique/searchsorted
    # conversion must recover exact grid indices
    grid = np.indices(sizes).reshape(len(sizes), -1).T
    assert np.array_equal(ds.factors_all, grid)
    img, fac = ds[5]
    assert img.shape == (64, 64, 3) and img.dtype == np.float32
    assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0
    # different object hues render differently
    a = ds[0][0]
    b = ds[int(np.prod(sizes[3:]) * 1)][0]   # bump floor hue index
    assert float(np.abs(a - b).max()) > 0.05


def test_cars3d_standin_generator(tmp_path):
    """scripts/make_cars3d_standin.py emits the nips2015-analogy cars
    .mat layout; the production `.mat` loader reads it."""
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_cars3d_standin import ensure_cars3d_standin

    from ctvae_tpu.data import disent_data

    root = str(tmp_path)
    ensure_cars3d_standin(root, n_cars=4, verbose=False)
    ensure_cars3d_standin(root, n_cars=4, verbose=False)   # idempotent

    # loader builds the full [4*24*elev] grid; patch FACTOR_SIZES to the
    # shrunk car count so the index grid matches
    orig = disent_data.FACTOR_SIZES["cars3d"]
    disent_data.FACTOR_SIZES["cars3d"] = (4, 24, 4)
    try:
        ds = disent_data.load_cars3d(
            root, split="all",
            transform=lambda im: im.astype(np.float32) / 255.0)
        assert len(ds) == 4 * 24 * 4
        img, fac = ds[7]
        assert img.shape == (128, 128, 3) and img.dtype == np.float32
        assert 0.0 <= float(img.min()) and float(img.max()) <= 1.0
    finally:
        disent_data.FACTOR_SIZES["cars3d"] = orig


def test_celeba_standin_generator(tmp_path):
    """scripts/make_celeba_standin.py emits the torchvision CelebA
    layout at any scale: partition file + real JPEGs the production
    loader (and its native decode path) reads."""
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from make_celeba_standin import ensure_celeba_standin

    from ctvae_tpu.data.celeba import MyCelebA
    from ctvae_tpu.data.transforms import StandardTransform

    root = str(tmp_path)
    folder = ensure_celeba_standin(root, count=24, verbose=False)
    assert os.path.exists(os.path.join(folder, "list_eval_partition.txt"))
    # idempotent: a second call writes nothing new
    ensure_celeba_standin(root, count=24, verbose=False)

    ds = MyCelebA(root, split="train",
                  transform=StandardTransform(32, crop=148))
    assert len(ds) == 24  # all 24 fall in the train partition range
    imgs, labels = ds.get_batch(np.arange(8))
    assert imgs.shape == (8, 32, 32, 3) and imgs.dtype == np.float32
    assert 0.0 <= float(imgs.min()) and float(imgs.max()) <= 1.0
    assert labels.shape == (8, 40)
