"""ctypes bindings for the native C++ preprocessing library.

The PIL path in sat_tpu.data.transforms stays the default (bit-parity with
the reference's torchvision transforms); this module is the high-throughput
serving path, two tiers:

- `resize_normalize`: one fused C++ pass doing bilinear resize + ImageNet
  normalization straight into a float32 NHWC buffer (input: decoded RGB).
- `load_image` / `load_images`: the complete file -> tensor path — read +
  JPEG/PNG decode (libjpeg/libpng) + the fused resize/normalize, entirely
  in C++, with a thread pool for batches (ctypes releases the GIL for the
  whole call). Per-image failures (exotic formats) report a status and the
  caller falls back to PIL for just those images.

The library auto-builds on first use if g++ is available
(tools/build_native.sh does the same ahead of time). `available()` gates
callers; everything degrades to the Python path when the toolchain or
artifact is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from sat_tpu import constants

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "build", "libsatpreproc.so")
_SRC_PATH = os.path.join(_REPO_ROOT, "native", "preproc.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_MEAN = np.asarray(constants.IMAGENET_MEAN, dtype=np.float32)
_STD = np.asarray(constants.IMAGENET_STD, dtype=np.float32)


def _build() -> bool:
    if not os.path.exists(_SRC_PATH):
        return False
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    # Build to a temp path and move into place atomically: concurrent
    # processes (a training run + a serve daemon) may both decide to
    # (re)build, and a reader must never dlopen a half-written .so.
    tmp_path = f"{_LIB_PATH}.build{os.getpid()}"
    base = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-o", tmp_path, _SRC_PATH, "-lpthread"]
    # Codecs drop independently (a JPEG-only host keeps the dominant
    # format's native decode even when libpng isn't linkable).
    for cmd in (base + ["-ljpeg", "-lpng"],
                base + ["-ljpeg", "-DSAT_NO_PNG"],
                base + ["-lpng", "-DSAT_NO_JPEG"],
                base + ["-DSAT_NO_CODECS"]):
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp_path, _LIB_PATH)
            return True
        except (OSError, subprocess.CalledProcessError):
            continue
    try:
        os.remove(tmp_path)
    except OSError:
        pass
    return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        stale = (os.path.exists(_LIB_PATH) and os.path.exists(_SRC_PATH)
                 and os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH))
        if (not os.path.exists(_LIB_PATH) or stale) and not _build():
            if not os.path.exists(_LIB_PATH):
                _load_failed = True
                return None
            import sys
            print("sat_tpu/native: rebuild of stale libsatpreproc.so failed; "
                  "loading the outdated library", file=sys.stderr)
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _load_failed = True
            return None
        lib.resize_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        lib.resize_normalize.restype = None
        try:
            lib.decode_support.restype = ctypes.c_int
            lib.load_resize_normalize.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
            lib.load_resize_normalize.restype = ctypes.c_int
            lib.load_resize_normalize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
            lib.load_resize_normalize_batch.restype = None
        except AttributeError:
            pass  # pre-decode build of the library; resize tier still works
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def resize_normalize(rgb: np.ndarray, size: int = constants.IMAGE_SIZE) -> np.ndarray:
    """(H, W, 3) uint8 -> (size, size, 3) float32, normalized. Native path."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native preprocessing library unavailable")
    src = np.ascontiguousarray(rgb, dtype=np.uint8)
    sh, sw = src.shape[:2]
    dst = np.empty((size, size, 3), dtype=np.float32)
    lib.resize_normalize(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), sh, sw,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), size, size,
        _MEAN.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _STD.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return dst


def decode_support() -> int:
    """Bitmask of in-native codecs: 1 = JPEG, 2 = PNG; 0 = decode tier not
    compiled in (resize tier may still be available)."""
    lib = _load()
    if lib is None or not hasattr(lib, "decode_support"):
        return 0
    return int(lib.decode_support())


# Status codes (keep in sync with native/preproc.cpp).
OK, ERR_READ, ERR_FORMAT, ERR_DECODE = 0, 1, 2, 3


def load_image(path: str, size: int = constants.IMAGE_SIZE) -> Optional[np.ndarray]:
    """Full native path for one image: file -> JPEG/PNG decode -> fused
    resize+normalize, no Python in between. Returns None when the native
    tier can't handle the file (caller falls back to PIL)."""
    lib = _load()
    if lib is None or not hasattr(lib, "load_resize_normalize"):
        return None
    dst = np.empty((size, size, 3), dtype=np.float32)
    st = lib.load_resize_normalize(
        path.encode(), dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size, size,
        _MEAN.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _STD.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return dst if st == OK else None


def load_images(paths: list, size: int = constants.IMAGE_SIZE,
                n_threads: int = 0):
    """Batched full-native load across a C++ thread pool (the GIL is
    released for the whole call). Returns (imgs (N,size,size,3) float32,
    status (N,) int32) — rows with status != OK are undefined and must be
    re-loaded via the Python path. n_threads=0 -> os.cpu_count()."""
    lib = _load()
    if lib is None or not hasattr(lib, "load_resize_normalize_batch"):
        return None, np.full(len(paths), ERR_FORMAT, dtype=np.int32)
    n = len(paths)
    dst = np.empty((n, size, size, 3), dtype=np.float32)
    status = np.empty(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    lib.load_resize_normalize_batch(
        arr, n, dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size, size,
        _MEAN.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        _STD.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads, status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return dst, status


def resize_normalize_reference(rgb: np.ndarray,
                               size: int = constants.IMAGE_SIZE) -> np.ndarray:
    """Pure-numpy mirror of the C++ kernel (same half-pixel bilinear
    convention); the golden reference for tests."""
    src = np.asarray(rgb, dtype=np.float32)
    sh, sw = src.shape[:2]
    fy = np.clip((np.arange(size) + 0.5) * (sh / size) - 0.5, 0, sh - 1)
    fx = np.clip((np.arange(size) + 0.5) * (sw / size) - 0.5, 0, sw - 1)
    y0 = fy.astype(np.int64)
    x0 = fx.astype(np.int64)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    out = ((1 - wy) * (1 - wx) * src[y0][:, x0]
           + (1 - wy) * wx * src[y0][:, x1]
           + wy * (1 - wx) * src[y1][:, x0]
           + wy * wx * src[y1][:, x1])
    return ((out / 255.0 - _MEAN) / _STD).astype(np.float32)
