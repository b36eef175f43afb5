"""Native (C++) input-pipeline acceleration, bound via ctypes.

Compiles ``transform_kernels.cpp`` on first use into
``libctvae_native.so`` (cached; rebuilt when the source is newer) and
exposes:

* ``crop_resize_batch(images, crop, out_hw)`` — uint8/float32 NHWC batch
  -> float32 NHWC in [0,1], fused center-crop(+pad) and PIL-compatible
  antialiased bilinear resize, threaded over the batch,
* ``load_jpeg_batch(paths, crop, out_hw)`` — fused libjpeg decode +
  crop + resize for file-backed datasets (CelebA).

``available()`` reports whether the library built; every caller in
``ctvae_tpu.data`` falls back to the PIL path when it did not (e.g. no
compiler in the deployment image). Set ``CTVAE_NATIVE=0`` to force the
fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple, Union

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "transform_kernels.cpp")
_LIB_PATH = os.path.join(_DIR, "libctvae_native.so")

_lib = None
_tried = False


def _default_threads() -> int:
    return max(1, (os.cpu_count() or 1))


def _build(out: Optional[str] = None) -> Optional[str]:
    out = out or _LIB_PATH
    if out == _LIB_PATH and os.path.exists(_LIB_PATH) and \
            os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
           "-march=native", _SRC, "-o", out, "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return out
    except Exception:
        return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("CTVAE_NATIVE", "1") == "0":
        return None
    path = _build()
    if path is None:
        return None
    try:
        lib = _bind(path)
    except AttributeError:
        # a prebuilt .so from an older source lacks a newer symbol (mtime
        # comparison can keep one when source and binary were written
        # together): rebuild from the current source. The stale library
        # is already dlopen-ed and glibc caches handles BY PATHNAME, so
        # the rebuild lands at a fresh path; the old library is only
        # replaced after the fresh one binds (if the rebuild fails — e.g.
        # no compiler — nothing is deleted and callers fall back to the
        # pure-numpy paths).
        fresh = _LIB_PATH + f".r{os.getpid()}"
        lib = None
        try:
            if _build(fresh):
                lib = _bind(fresh)
                os.replace(fresh, _LIB_PATH)
        except (OSError, AttributeError):
            lib = None
        finally:
            if os.path.exists(fresh):
                try:
                    os.remove(fresh)
                except OSError:
                    pass
    except OSError:
        lib = None
    _lib = lib
    return _lib


def _bind(path: str):
    lib = ctypes.CDLL(path)
    lib.ctvae_crop_resize_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int]
    lib.ctvae_crop_resize_f32.argtypes = lib.ctvae_crop_resize_u8.argtypes
    lib.ctvae_load_jpeg_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
    lib.ctvae_load_jpeg_batch.restype = ctypes.c_int
    lib.ctvae_gather_u8_to_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int]
    return lib


def available() -> bool:
    return _load() is not None


def crop_resize_batch(images: np.ndarray, crop: Optional[int],
                      out_hw: Union[int, Tuple[int, int]],
                      n_threads: Optional[int] = None) -> np.ndarray:
    """[N,H,W,C] uint8 or float32 -> [N,out_h,out_w,C] float32 in [0,1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if isinstance(out_hw, int):
        out_hw = (out_hw, out_hw)
    out_h, out_w = out_hw
    images = np.ascontiguousarray(images)
    if images.ndim == 3:
        images = images[..., None]
    n, h, w, c = images.shape
    out = np.empty((n, out_h, out_w, c), np.float32)
    nt = n_threads or _default_threads()
    crop_v = int(crop) if crop else 0
    if images.dtype == np.uint8:
        lib.ctvae_crop_resize_u8(
            images.ctypes.data, n, h, w, c, crop_v, out_h, out_w,
            out.ctypes.data, nt)
    else:
        images = images.astype(np.float32, copy=False)
        lib.ctvae_crop_resize_f32(
            images.ctypes.data, n, h, w, c, crop_v, out_h, out_w,
            out.ctypes.data, nt)
    return out


def gather_u8_batch(src: np.ndarray, idxs: np.ndarray,
                    n_threads: Optional[int] = None) -> np.ndarray:
    """Fused ``src[idxs].astype(np.float32) / 255.0`` for a uint8 array:
    one pass (gather + convert + scale), threaded over rows. ``src`` is
    [M, ...] uint8, ``idxs`` int64-coercible [N]; returns [N, ...]
    float32 in [0, 1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    src = np.ascontiguousarray(src)
    assert src.dtype == np.uint8, src.dtype
    idxs = np.asarray(idxs, dtype=np.int64)
    # numpy fancy-indexing semantics: negatives wrap, out-of-range raises
    # (the C kernel itself does no validation — it would silently read
    # out-of-bounds memory)
    n_src = src.shape[0]
    idxs = np.where(idxs < 0, idxs + n_src, idxs)
    if idxs.size and (idxs.min() < 0 or idxs.max() >= n_src):
        bad = idxs[(idxs < 0) | (idxs >= n_src)][0]
        raise IndexError(f"index {bad} is out of bounds for axis 0 with "
                         f"size {n_src}")
    idxs = np.ascontiguousarray(idxs)
    row_elems = int(np.prod(src.shape[1:], dtype=np.int64))
    out = np.empty((len(idxs),) + src.shape[1:], np.float32)
    lib.ctvae_gather_u8_to_f32(
        src.ctypes.data, idxs.ctypes.data, len(idxs), row_elems,
        out.ctypes.data, n_threads or _default_threads())
    return out


def load_jpeg_batch(paths: Sequence[str], crop: Optional[int],
                    out_hw: Union[int, Tuple[int, int]],
                    n_threads: Optional[int] = None) -> np.ndarray:
    """JPEG files -> [N,out_h,out_w,3] float32 in [0,1] (decode + crop +
    resize fused, threaded). Raises on any decode failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if isinstance(out_hw, int):
        out_hw = (out_hw, out_hw)
    out_h, out_w = out_hw
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.ctvae_load_jpeg_batch(
        arr, n, int(crop) if crop else 0, out_h, out_w, out.ctypes.data,
        n_threads or _default_threads())
    if failures:
        raise IOError(f"{failures}/{n} JPEG files failed to decode")
    return out
