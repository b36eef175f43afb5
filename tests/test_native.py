"""Native C++ input-pipeline kernels vs the PIL reference path."""

import os

import numpy as np
import pytest

from ctvae_tpu import native
from ctvae_tpu.data.transforms import StandardTransform

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library did not build")


def _pil_ref(imgs, crop, patch):
    t = StandardTransform(patch, crop=crop)
    return np.stack([t(im) for im in imgs])


def test_crop_resize_matches_pil_downscale():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (8, 218, 178, 3)).astype(np.uint8)
    out = native.crop_resize_batch(imgs, 148, 64)
    ref = _pil_ref(imgs, 148, 64)
    assert out.shape == (8, 64, 64, 3)
    # PIL rounds through uint8 between crop and resize; the native path
    # stays float, so agreement is ~1 LSB of uint8.
    assert np.abs(out - ref).max() < 2.0 / 255.0


def test_crop_resize_pad_path_grayscale():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (4, 64, 64, 1)).astype(np.uint8)
    out = native.crop_resize_batch(imgs, 148, 64)
    ref = _pil_ref(imgs, 148, 64)
    assert np.abs(out - ref).max() < 2.0 / 255.0


def test_crop_resize_float_input_identity():
    rng = np.random.default_rng(2)
    imgs = rng.uniform(size=(3, 32, 32, 3)).astype(np.float32)
    out = native.crop_resize_batch(imgs, None, 32)
    np.testing.assert_allclose(out, imgs, atol=1e-6)


def test_load_jpeg_batch(tmp_path):
    from PIL import Image
    rng = np.random.default_rng(3)
    paths = []
    for i in range(6):
        arr = rng.integers(0, 255, (218, 178, 3)).astype(np.uint8)
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    out = native.load_jpeg_batch(paths, 148, 64)
    t = StandardTransform(64, crop=148)
    ref = np.stack([t(np.asarray(Image.open(p).convert("RGB")))
                    for p in paths])
    assert np.abs(out - ref).max() < 2.0 / 255.0


def test_load_jpeg_batch_raises_on_missing(tmp_path):
    with pytest.raises(IOError):
        native.load_jpeg_batch([str(tmp_path / "missing.jpg")], 148, 64)


def test_transform_batch_uses_native():
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 255, (5, 100, 90, 3)).astype(np.uint8)
    t = StandardTransform(48, crop=80)
    out = t.batch(imgs)
    ref = np.stack([t(im) for im in imgs])
    assert out.shape == ref.shape == (5, 48, 48, 3)
    assert np.abs(out - ref).max() < 2.0 / 255.0


def test_gather_u8_batch_bit_exact():
    """Fused native gather+convert == numpy gather -> astype -> /255,
    bitwise (the LUT reproduces true division, not reciprocal-multiply)."""
    rng = np.random.default_rng(5)
    src = rng.integers(0, 256, (64, 16, 16, 3)).astype(np.uint8)
    idxs = rng.integers(0, 64, 23)
    out = native.gather_u8_batch(src, idxs)
    ref = src[idxs].astype(np.float32) / 255.0
    assert out.dtype == np.float32
    assert np.array_equal(out, ref)


def test_disent_cached_get_batch_uses_native(tmp_path):
    """ArrayFactorDataset's cached hot path returns the same batches
    whether the native gather kernel or the numpy fallback serves it."""
    from ctvae_tpu.data.disent_data import ArrayFactorDataset

    rng = np.random.default_rng(6)
    imgs = rng.integers(0, 256, (30, 16, 16, 3)).astype(np.uint8)
    factors = np.stack(np.unravel_index(np.arange(30), (5, 6))).T
    ds = ArrayFactorDataset(imgs, factors, (5, 6), str(tmp_path), "x",
                            split="train",
                            transform=StandardTransform(16, crop=None),
                            cache_transformed=True)
    idxs = rng.integers(0, len(ds), 11)
    got, f = ds.get_batch(idxs)
    ref = ds._cache[np.asarray(idxs)].astype(np.float32) / 255.0
    assert np.array_equal(got, ref)
    assert f.shape == (11, 2)


def test_gather_u8_batch_bounds_and_negative_wrap():
    """Negative indices wrap like numpy fancy indexing; out-of-range
    indices raise IndexError instead of silently reading out-of-bounds
    memory (the C kernel does no validation)."""
    rng = np.random.default_rng(7)
    src = rng.integers(0, 256, (5, 2, 2, 1)).astype(np.uint8)
    out = native.gather_u8_batch(src, [-1, -5, 3])
    ref = src[[-1, -5, 3]].astype(np.float32) / 255.0
    assert np.array_equal(out, ref)
    with pytest.raises(IndexError):
        native.gather_u8_batch(src, [0, 5])
    with pytest.raises(IndexError):
        native.gather_u8_batch(src, [-6])
