"""Image-quality metrics: PSNR, SSIM, and (optional) LPIPS.

Native JAX/numpy re-implementations of the metrics the reference pulls from
``torchmetrics`` (``/root/reference/torch_nerf/src/utils/metrics/
rgb_metrics.py:19-121``):

* PSNR — peak signal-to-noise ratio with data range 1.0 (torchmetrics
  default on [0,1] images computes the range from the data; we pin 1.0,
  the convention used by every published NeRF table).
* SSIM — structural similarity with an 11x11 Gaussian window (sigma=1.5),
  K1=0.01 / K2=0.03, matching torchmetrics/Wang et al. defaults.
* LPIPS — requires pretrained AlexNet features; gated on torchvision with
  locally-cached weights (no network egress here). ``lpips_available()``
  reports whether it can run.

Also provides directory-vs-directory comparison mirroring the reference's
``compute_*_between_directories`` contract (size matching, white-background
alpha compositing, batched accumulation).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np


def psnr(pred: np.ndarray, target: np.ndarray, data_range: float = 1.0) -> float:
    """PSNR in dB between images (any matching shapes, values in [0, range])."""
    pred = np.asarray(pred, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    mse = np.mean((pred - target) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2.0 * sigma**2))
    g /= g.sum()
    return np.outer(g, g)


def _filter2d_valid(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """'valid' 2D correlation of (H, W) with (k, k) via stride tricks."""
    k = kernel.shape[0]
    h, w = img.shape
    windows = np.lib.stride_tricks.sliding_window_view(img, (k, k))
    return np.einsum("ijkl,kl->ij", windows, kernel)


def ssim(
    pred: np.ndarray,
    target: np.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    """Mean SSIM over channels; images (H, W, C) or (H, W) in [0, range]."""
    pred = np.asarray(pred, dtype=np.float64)
    target = np.asarray(target, dtype=np.float64)
    if pred.ndim == 2:
        pred, target = pred[..., None], target[..., None]

    # shrink the window for tiny images (must stay odd and <= both dims)
    max_k = min(pred.shape[0], pred.shape[1])
    if kernel_size > max_k:
        kernel_size = max_k if max_k % 2 == 1 else max_k - 1

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kernel = _gaussian_kernel(kernel_size, sigma)

    vals = []
    for c in range(pred.shape[-1]):
        x, y = pred[..., c], target[..., c]
        mu_x = _filter2d_valid(x, kernel)
        mu_y = _filter2d_valid(y, kernel)
        mu_xx = _filter2d_valid(x * x, kernel)
        mu_yy = _filter2d_valid(y * y, kernel)
        mu_xy = _filter2d_valid(x * y, kernel)

        var_x = mu_xx - mu_x**2
        var_y = mu_yy - mu_y**2
        cov_xy = mu_xy - mu_x * mu_y

        num = (2 * mu_x * mu_y + c1) * (2 * cov_xy + c2)
        den = (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)
        vals.append(np.mean(num / den))
    return float(np.mean(vals))


# ---------------------------------------------------------------------------
# LPIPS (calibrated; needs locally-provided pretrained weights — lpips.py)

_LPIPS_WEIGHTS = None
_LPIPS_PROBED = False


def lpips_available() -> bool:
    """True when calibrated LPIPS-alex weights were found on this machine.

    Weight search order is documented in :mod:`torch_nerf_tpu.lpips` (the
    ``$LPIPS_WEIGHTS`` env var, then the torch-hub checkpoint cache). There
    is deliberately no uncalibrated fallback: numbers are either comparable
    to the reference's torchmetrics LPIPS or not reported at all.
    """
    global _LPIPS_WEIGHTS, _LPIPS_PROBED
    if not _LPIPS_PROBED:
        from torch_nerf_tpu.lpips import load_weights  # noqa: PLC0415

        _LPIPS_WEIGHTS = load_weights()
        _LPIPS_PROBED = True
    return _LPIPS_WEIGHTS is not None


def lpips(pred: np.ndarray, target: np.ndarray) -> Optional[float]:
    """Calibrated LPIPS(alex) distance, or None when no weights are present.

    Same math and weights as the reference's torchmetrics wrapper
    (``rgb_metrics.py:19-43``) — see :func:`torch_nerf_tpu.lpips.lpips_alex`.
    """
    if not lpips_available():
        return None
    from torch_nerf_tpu.lpips import lpips_alex  # noqa: PLC0415

    return lpips_alex(pred, target, _LPIPS_WEIGHTS)


# ---------------------------------------------------------------------------
# directory-vs-directory evaluation (runners/evaluate.py contract)


def _load_image_pair(file1: Path, file2: Path) -> Tuple[np.ndarray, np.ndarray]:
    from PIL import Image  # noqa: PLC0415

    a = Image.open(file1)
    b = Image.open(file2)
    w = min(a.size[0], b.size[0])
    h = min(a.size[1], b.size[1])
    a = a.resize((w, h))
    b = b.resize((w, h))

    def to_rgb(img) -> np.ndarray:
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if arr.ndim == 3 and arr.shape[-1] == 4:
            alpha = arr[..., -1]
            arr = arr.copy()
            arr[alpha == 0.0, :] = 1.0  # white background (rgb_metrics.py:91-99)
            arr = arr[..., :3]
        return arr

    return to_rgb(a), to_rgb(b)


def compare_directories(pred_dir: str | Path, target_dir: str | Path) -> Dict[str, float]:
    """PSNR/SSIM (and LPIPS when available) averaged over paired images.

    Pairs files by name as the reference's
    ``compute_metric_between_directories`` does.
    """
    pred_dir, target_dir = Path(pred_dir), Path(target_dir)
    if not pred_dir.exists() or not target_dir.exists():
        raise FileNotFoundError(f"{pred_dir} or {target_dir} does not exist")

    psnrs, ssims, lpipss = [], [], []
    use_lpips = lpips_available()
    for file1 in sorted(pred_dir.iterdir()):
        file2 = target_dir / file1.name
        if not file2.exists():
            raise FileNotFoundError(f"Missing pair for {file1.name} in {target_dir}")
        a, b = _load_image_pair(file1, file2)
        psnrs.append(psnr(a, b))
        ssims.append(ssim(a, b))
        if use_lpips:
            lpipss.append(lpips(a, b))

    out = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}
    if lpipss:
        out["lpips"] = float(np.mean(lpipss))
    return out
