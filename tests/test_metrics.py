"""Tests for native PSNR/SSIM metrics and directory comparison."""

import numpy as np
import pytest
from PIL import Image

from torch_nerf_tpu import metrics


def test_psnr_known_values():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = 20 dB
    assert np.isclose(metrics.psnr(a, b), 20.0, rtol=1e-6)
    assert metrics.psnr(a, a) == float("inf")


def test_ssim_identical_is_one():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 32, 3))
    assert np.isclose(metrics.ssim(img, img), 1.0, atol=1e-9)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(32, 32, 3))
    light = np.clip(img + rng.normal(0, 0.02, img.shape), 0, 1)
    heavy = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1)
    s_light = metrics.ssim(img, light)
    s_heavy = metrics.ssim(img, heavy)
    assert 0 < s_heavy < s_light < 1.0


def test_ssim_matches_scipy_reference():
    """Cross-check against an independent computation with scipy filters."""
    from scipy.ndimage import correlate

    rng = np.random.default_rng(2)
    x = rng.uniform(size=(24, 24))
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1)

    kernel = metrics._gaussian_kernel(11, 1.5)
    ours = metrics._filter2d_valid(x, kernel)
    theirs = correlate(x, kernel, mode="constant")[5:-5, 5:-5]
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)

    s = metrics.ssim(x, y)
    assert 0 < s < 1


def test_compare_directories(tmp_path):
    pred = tmp_path / "pred"
    target = tmp_path / "target"
    pred.mkdir()
    target.mkdir()
    rng = np.random.default_rng(3)
    for i in range(2):
        img = rng.integers(0, 255, size=(16, 16, 3), dtype=np.uint8)
        noisy = np.clip(
            img.astype(int) + rng.integers(-10, 10, img.shape), 0, 255
        ).astype(np.uint8)
        Image.fromarray(img).save(target / f"{i}.png")
        Image.fromarray(noisy).save(pred / f"{i}.png")
    out = metrics.compare_directories(pred, target)
    assert "psnr" in out and "ssim" in out
    assert out["psnr"] > 20.0
    assert 0 < out["ssim"] <= 1.0


def test_compare_directories_white_bg_compositing(tmp_path):
    pred = tmp_path / "pred"
    target = tmp_path / "target"
    pred.mkdir()
    target.mkdir()
    # RGBA image, transparent everywhere -> white after compositing
    rgba = np.zeros((8, 8, 4), dtype=np.uint8)
    Image.fromarray(rgba, "RGBA").save(pred / "a.png")
    white = np.full((8, 8, 3), 255, dtype=np.uint8)
    Image.fromarray(white).save(target / "a.png")
    out = metrics.compare_directories(pred, target)
    assert out["psnr"] == float("inf") or out["psnr"] > 50


def test_missing_pair_raises(tmp_path):
    pred = tmp_path / "pred"
    target = tmp_path / "target"
    pred.mkdir()
    target.mkdir()
    Image.fromarray(np.zeros((4, 4, 3), dtype=np.uint8)).save(pred / "x.png")
    with pytest.raises(FileNotFoundError):
        metrics.compare_directories(pred, target)
