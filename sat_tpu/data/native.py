"""ctypes bindings for the native C++ preprocessing library.

The PIL path in sat_tpu.data.transforms stays the default (bit-parity with
the reference's torchvision transforms); this module is the high-throughput
serving path: one fused C++ pass doing bilinear resize + ImageNet
normalization straight into a float32 NHWC buffer.

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
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", _LIB_PATH, _SRC_PATH],
            check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) and not _build():
            _load_failed = True
            return None
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
