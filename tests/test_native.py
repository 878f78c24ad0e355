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


@pytest.fixture(scope="module")
def decode_available(lib_available):
    if native.decode_support() == 0:
        pytest.skip("native build lacks JPEG/PNG codecs; decode tier optional")
    return native.decode_support()


def _smooth_rgb(h=96, w=120):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([yy * 255 / h, xx * 255 / w, (yy + xx) * 127 / (h + w)],
                   axis=-1)
    return img.astype(np.uint8)


def test_native_png_decode_exact(decode_available, tmp_path):
    """PNG is lossless: the full-native path must equal PIL-decode +
    native-resize bit for bit (identical uint8 in, identical kernel)."""
    from PIL import Image
    img = _smooth_rgb()
    p = str(tmp_path / "img.png")
    Image.fromarray(img).save(p)
    nat = native.load_image(p, 64)
    assert nat is not None
    via_pil = native.resize_normalize(
        np.asarray(Image.open(p).convert("RGB"), np.uint8), 64)
    np.testing.assert_array_equal(nat, via_pil)


def test_native_gray_png_matches_pil_rgb_convert(decode_available, tmp_path):
    from PIL import Image
    gray = (_smooth_rgb()[:, :, 0]).astype(np.uint8)
    p = str(tmp_path / "gray.png")
    Image.fromarray(gray, mode="L").save(p)
    nat = native.load_image(p, 64)
    assert nat is not None
    via_pil = native.resize_normalize(
        np.asarray(Image.open(p).convert("RGB"), np.uint8), 64)
    np.testing.assert_array_equal(nat, via_pil)


def test_native_jpeg_decode_close_to_pil(decode_available, tmp_path):
    """JPEG decode: PIL also uses libjpeg, so outputs should be essentially
    identical; allow a tiny tolerance for decoder build differences."""
    from PIL import Image
    img = _smooth_rgb(128, 128)
    p = str(tmp_path / "img.jpg")
    Image.fromarray(img).save(p, quality=95)
    nat = native.load_image(p, 64)
    assert nat is not None
    via_pil = native.resize_normalize(
        np.asarray(Image.open(p).convert("RGB"), np.uint8), 64)
    # normalized units: 1 uint8 step ~ 1/255/0.225 ~ 0.0174
    assert np.abs(nat - via_pil).max() < 0.06
    assert np.abs(nat - via_pil).mean() < 0.005


def test_native_decode_failures(decode_available, tmp_path):
    assert native.load_image(str(tmp_path / "missing.jpg"), 64) is None
    bad = str(tmp_path / "bad.jpg")
    open(bad, "wb").write(b"not an image at all")
    assert native.load_image(bad, 64) is None


def test_native_batch_mixed_status_and_threads(decode_available, tmp_path):
    from PIL import Image
    paths, singles = [], []
    for i in range(6):
        p = str(tmp_path / f"b{i}.png")
        Image.fromarray(_smooth_rgb(64 + i, 80 + i)).save(p)
        paths.append(p)
        singles.append(native.load_image(p, 48))
    paths.insert(3, str(tmp_path / "missing.png"))  # one bad row mid-batch

    for n_threads in (1, 4):
        imgs, status = native.load_images(paths, 48, n_threads=n_threads)
        assert status[3] == native.ERR_READ
        good = [i for i in range(len(paths)) if i != 3]
        assert all(status[i] == native.OK for i in good)
        for out_row, single in zip((imgs[i] for i in good), singles):
            np.testing.assert_array_equal(out_row, single)


def test_load_and_preprocess_full_native_path(decode_available, tmp_path):
    """SAT_NATIVE_PREPROC routes through the full-native tier and falls
    back to PIL for files the codecs reject."""
    from PIL import Image
    from sat_tpu.data.transforms import load_and_preprocess_image
    p = str(tmp_path / "img.jpg")
    Image.fromarray(_smooth_rgb()).save(p, quality=92)
    out = load_and_preprocess_image(p, 64, use_native=True)
    np.testing.assert_array_equal(out, native.load_image(p, 64))

    # a BMP is rejected by the native tier -> PIL fallback, still succeeds
    bmp = str(tmp_path / "img.bmp")
    Image.fromarray(_smooth_rgb()).save(bmp)
    out_bmp = load_and_preprocess_image(bmp, 64, use_native=True)
    assert out_bmp.shape == (64, 64, 3) and np.isfinite(out_bmp).all()


def test_dataset_batched_native_load(decode_available, tmp_path, monkeypatch):
    """CaptionDataset.load_image_batch: one C++ thread-pool call for the
    whole batch, per-row PIL fallback for rejected formats, cache filled."""
    import os

    from PIL import Image
    from tests._synth import build_synth_dataset
    from sat_tpu.data import generate_json_data
    from sat_tpu.data.dataset import CaptionDataset
    from sat_tpu.data.transforms import load_and_preprocess_image

    root = str(tmp_path / "data")
    os.makedirs(root)
    build_synth_dataset(root, n_train=1, n_val=1, n_test=4, caps_per_img=2,
                        image_size=40)
    # vary formats: img #2 jpeg, #3 bmp (native tier rejects bmp -> fallback)
    import json
    ds_json = json.load(open(f"{root}/dataset.json"))
    test_imgs = [im for im in ds_json["images"] if im["split"] == "test"]
    for im, ext in [(test_imgs[2], "jpg"), (test_imgs[3], "bmp")]:
        old = f"{root}/imgs/{im['filename']}"
        new = old[:-3] + ext
        Image.open(old).save(new)
        os.remove(old)
        im["filename"] = os.path.basename(new)
    json.dump(ds_json, open(f"{root}/dataset.json", "w"))
    generate_json_data(f"{root}/dataset.json", root, 2, 1, 8)

    monkeypatch.setenv("SAT_NATIVE_PREPROC", "1")
    ds = CaptionDataset(root, "test", image_size=40)
    idxs = list(range(len(ds)))
    batch = ds.load_image_batch(idxs)
    assert batch.shape == (len(idxs), 40, 40, 3)
    for pos, i in enumerate(idxs):
        single = load_and_preprocess_image(ds.img_paths[i], 40,
                                           use_native=True)
        np.testing.assert_array_equal(batch[pos], single)
    # cache is now warm: a second call must not re-decode (remove the files)
    for p in set(ds.img_paths):
        os.remove(p)
    np.testing.assert_array_equal(ds.load_image_batch(idxs), batch)

    monkeypatch.delenv("SAT_NATIVE_PREPROC")


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
