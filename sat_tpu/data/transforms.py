"""Host-side image preprocessing in numpy/PIL.

Replicates the reference transform pipeline (reference train.py:27-32):
resize to 224x224 (bilinear on the PIL image, torchvision's default for PIL
inputs), scale to [0,1], ImageNet-normalize. Output is **NHWC** float32 —
the TPU-native layout — unlike the reference's CHW; encoders here consume
NHWC directly.
"""

from __future__ import annotations

import numpy as np
from PIL import Image

from sat_tpu import constants

_MEAN = np.asarray(constants.IMAGENET_MEAN, dtype=np.float32)
_STD = np.asarray(constants.IMAGENET_STD, dtype=np.float32)


def pil_loader(path: str) -> Image.Image:
    """RGB-converting loader (reference dataset.py:9-12)."""
    with open(path, "rb") as f:
        img = Image.open(f)
        return img.convert("RGB")


def preprocess_pil(img: Image.Image, size: int = constants.IMAGE_SIZE) -> np.ndarray:
    img = img.resize((size, size), Image.BILINEAR)
    arr = np.asarray(img, dtype=np.float32) / 255.0   # (H, W, 3) in [0,1]
    return (arr - _MEAN) / _STD


def load_and_preprocess_image(path: str, size: int = constants.IMAGE_SIZE,
                              use_native: bool | None = None) -> np.ndarray:
    """Load + resize + normalize one image.

    `use_native` routes resize+normalize through the fused C++ kernel
    (sat_tpu.data.native) instead of PIL; default is the environment toggle
    SAT_NATIVE_PREPROC=1. PIL remains the parity path (it matches the
    reference's torchvision transforms bit-for-bit); the native path is the
    throughput option (different but visually identical bilinear kernel).
    """
    import os
    if use_native is None:
        use_native = os.environ.get("SAT_NATIVE_PREPROC") == "1"
    if use_native:
        from sat_tpu.data import native
        # Full-native tier first (file -> decode -> resize -> normalize all
        # in C++); falls through per image when the codec can't handle it.
        out = native.load_image(path, size) if native.decode_support() else None
        if out is not None:
            return out
        if native.available():
            img = pil_loader(path)
            return native.resize_normalize(np.asarray(img, np.uint8), size)
    return preprocess_pil(pil_loader(path), size)


def denormalize(img: np.ndarray) -> np.ndarray:
    """Invert ImageNet normalization back to [0,1] (for attention viz,
    reference train.py:392-399)."""
    return np.clip(img * _STD + _MEAN, 0.0, 1.0)
