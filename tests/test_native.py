"""Tests for the native C++ image pipeline (PNG codec, batch decode, minify)."""

import numpy as np
import pytest
from PIL import Image

from torch_nerf_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (no toolchain)"
)


def test_png_decode_matches_pil_rgba(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(37, 23, 4), dtype=np.uint8)
    path = tmp_path / "x.png"
    Image.fromarray(img, "RGBA").save(path)
    dec = native.png_decode(path)
    np.testing.assert_array_equal(dec, img)


def test_png_decode_matches_pil_rgb_and_gray(tmp_path):
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, size=(16, 20, 3), dtype=np.uint8)
    Image.fromarray(rgb, "RGB").save(tmp_path / "rgb.png")
    np.testing.assert_array_equal(native.png_decode(tmp_path / "rgb.png"), rgb)

    gray = rng.integers(0, 255, size=(12, 9), dtype=np.uint8)
    Image.fromarray(gray, "L").save(tmp_path / "gray.png")
    np.testing.assert_array_equal(native.png_decode(tmp_path / "gray.png"), gray)


def test_png_decode_batch(tmp_path):
    rng = np.random.default_rng(2)
    paths, imgs = [], []
    for i in range(6):
        img = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
        p = tmp_path / f"b{i}.png"
        Image.fromarray(img, "RGB").save(p)
        paths.append(p)
        imgs.append(img)
    batch = native.png_decode_batch(paths, 16, 16, 3, num_threads=3)
    np.testing.assert_allclose(batch, np.stack(imgs) / 255.0, atol=1e-6)


def test_area_downsample_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(12, 8, 3)).astype(np.float32)
    out = native.area_downsample(x, 4)
    ref = x.reshape(3, 4, 2, 4, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_decode_missing_file_returns_none(tmp_path):
    assert native.png_decode(tmp_path / "nope.png") is None
