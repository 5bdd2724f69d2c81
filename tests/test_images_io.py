"""Image batch I/O tests for the input-100.bin format (Network.c:24-97)."""

import numpy as np
import pytest

from vit_tpu.io import images as iio


def test_save_load_roundtrip(tmp_path):
    imgs = np.random.default_rng(0).normal(size=(5, 3, 16, 16)).astype(np.float32)
    path = tmp_path / "input.bin"
    iio.save_image_bin(imgs, path)
    loaded = iio.load_image_bin(path)
    np.testing.assert_array_equal(loaded, imgs)


def test_header_layout(tmp_path):
    # 4 x int32 little-endian (n, c, h, w) then fp32 NCHW (Network.c:36-44)
    imgs = np.zeros((2, 3, 4, 5), np.float32)
    path = tmp_path / "input.bin"
    iio.save_image_bin(imgs, path)
    raw = path.read_bytes()
    np.testing.assert_array_equal(
        np.frombuffer(raw[:16], "<i4"), [2, 3, 4, 5]
    )
    assert len(raw) == 16 + 2 * 3 * 4 * 5 * 4


def test_truncated_file_raises(tmp_path):
    path = tmp_path / "bad.bin"
    path.write_bytes(np.array([2, 3, 4, 5], "<i4").tobytes() + b"\x00" * 8)
    with pytest.raises(ValueError):
        iio.load_image_bin(path)


def test_negative_header_field_raises(tmp_path, monkeypatch):
    # both the native and the NumPy loader must reject garbage headers with
    # the format message, not an opaque numpy negative-count/reshape error
    path = tmp_path / "neg.bin"
    path.write_bytes(
        np.array([-2, -3, 4, 5], "<i4").tobytes()
        + np.zeros(2 * 3 * 4 * 5, "<f4").tobytes()
    )
    from vit_tpu.io import native

    if native.available():
        with pytest.raises(ValueError, match="negative header field"):
            native.read_image_bin(path)
    # NumPy fallback path, regardless of whether the .so is built
    monkeypatch.setattr(native, "available", lambda: False)
    with pytest.raises(ValueError, match="negative header field"):
        iio.load_image_bin(path)


def test_synth_images_deterministic(tiny_cfg):
    a = iio.synth_images(3, tiny_cfg, seed=7)
    b = iio.synth_images(3, tiny_cfg, seed=7)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (3, 3, tiny_cfg.image_size, tiny_cfg.image_size)


def test_preprocess_normalization():
    raw = np.full((1, 4, 4, 3), 255, np.uint8)
    out = iio.preprocess(raw)
    assert out.shape == (1, 3, 4, 4)
    want = (1.0 - iio.IMAGENET_MEAN) / iio.IMAGENET_STD
    np.testing.assert_allclose(out[0, :, 0, 0], want, atol=1e-6)
