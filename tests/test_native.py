"""Native C++ preprocessing: build, bind, and golden-compare against the
numpy mirror of the same bilinear/normalize math."""

import numpy as np
import pytest

from sat_tpu.data import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("g++ toolchain unavailable; native path optional")
    return True


def test_native_matches_numpy_reference(lib_available):
    rng = np.random.default_rng(0)
    for sh, sw in [(64, 64), (480, 640), (224, 224), (31, 57)]:
        img = rng.integers(0, 256, size=(sh, sw, 3), dtype=np.uint8)
        ours = native.resize_normalize(img, 224)
        ref = native.resize_normalize_reference(img, 224)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_native_identity_resize_is_exact_normalize(lib_available):
    img = np.full((224, 224, 3), 128, dtype=np.uint8)
    out = native.resize_normalize(img, 224)
    expected = (128 / 255.0 - np.array([0.485, 0.456, 0.406])) / \
        np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0], expected.astype(np.float32), atol=1e-5)


def test_native_close_to_pil_path(lib_available):
    """Different bilinear conventions (PIL uses area-weighted support) —
    but on smooth images the two paths must agree closely."""
    from PIL import Image
    from sat_tpu.data.transforms import preprocess_pil
    yy, xx = np.mgrid[0:128, 0:128]
    smooth = np.stack([yy, xx, (yy + xx) / 2], axis=-1).astype(np.float32)
    smooth = (smooth / smooth.max() * 255).astype(np.uint8)
    pil_out = preprocess_pil(Image.fromarray(smooth), 224)
    nat_out = native.resize_normalize(smooth, 224)
    assert np.abs(pil_out - nat_out).mean() < 0.05
