"""Observability: metrics logging (JSONL + TensorBoard) and step timing.

Replaces the reference's TensorBoard-only logging
(``/root/reference/torch_nerf/runners/runner_utils.py:553-566`` and
``runners/train.py:441-461``) with a dual sink:

* an always-on JSONL stream (``<log_dir>/metrics.jsonl``) — machine-readable,
  dependency-free, what the benchmark harness consumes;
* TensorBoard scalars/images when the ``tensorboard`` package is available
  (same tag names as the reference: ``train/loss``, ``val/psnr``, ...).

Also provides ``StepTimer`` — rays/sec/chip is the framework's first-class
performance metric (SURVEY.md §5.1), sampled with monotonic wall-clock
around blocked steps.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np


class MetricsLogger:
    def __init__(self, log_dir: str | Path, use_tensorboard: bool = True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a", buffering=1)
        self._t0 = time.perf_counter()
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # noqa: PLC0415

                tb_dir = self.log_dir / "tensorboard"
                tb_dir.mkdir(exist_ok=True)
                self._tb = SummaryWriter(log_dir=str(tb_dir))
            except Exception:
                self._tb = None

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        # wall seconds since logger creation (~session start): lets offline
        # consumers build metric-vs-wall-time curves (e.g. time-to-31dB)
        record = {"step": int(step), "wall_s": round(time.perf_counter() - self._t0, 3)}
        record.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for key, value in scalars.items():
                self._tb.add_scalar(key, float(value), int(step))

    def log_image(self, step: int, tag: str, image: np.ndarray) -> None:
        """image: (H, W, 3) float in [0, 1]."""
        if self._tb is not None:
            self._tb.add_image(tag, np.transpose(image, (2, 0, 1)), int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def device_peak_flops() -> Optional[float]:
    """bf16 peak FLOP/s of one local accelerator chip, if known."""
    try:
        import jax  # noqa: PLC0415

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    table = {
        "tpu v5 lite": 197e12,  # v5e
        "tpu v5e": 197e12,
        "tpu v5": 459e12,  # v5p
        "tpu v4": 275e12,
        "tpu v6": 918e12,  # trillium
    }
    for name, peak in table.items():
        if kind.startswith(name):
            return peak
    return None


class StepTimer:
    """Windowed steps/sec + rays/sec (+ MFU) tracker.

    Only the WINDOW-BOUNDARY stamps feed the rate computation, and those are
    taken after blocking on the step's output (``sync``): JAX dispatch is
    asynchronous, so unsynced wall-clock measures the Python enqueue rate,
    not the device (bench.py chains through a blocked result for the same
    reason). The block happens once per window — one pipeline drain per 50
    steps, negligible.

    ``flops_per_step`` (optional) adds achieved TFLOP/s and MFU (fraction of
    the chip's bf16 peak) next to rays/s — SURVEY.md §5.1's first-class perf
    metrics.
    """

    def __init__(
        self,
        rays_per_step: int,
        window: int = 50,
        flops_per_step: Optional[float] = None,
    ):
        self.rays_per_step = rays_per_step
        self.window = window
        self.flops_per_step = flops_per_step
        self._peak = device_peak_flops()
        self._count = 0
        self._last_boundary: Optional[float] = None

    def tick(self, sync=None) -> Optional[Dict[str, float]]:
        self._count += 1
        if self._count % self.window != 0:
            return None
        if sync is not None:
            try:
                import jax  # noqa: PLC0415

                jax.block_until_ready(sync)
            except Exception:
                pass
        now = time.perf_counter()
        prev, self._last_boundary = self._last_boundary, now
        if prev is None:
            return None
        steps_per_sec = self.window / (now - prev)
        out = {
            "perf/steps_per_sec": steps_per_sec,
            "perf/rays_per_sec": steps_per_sec * self.rays_per_step,
        }
        if self.flops_per_step:
            flops_per_sec = steps_per_sec * self.flops_per_step
            out["perf/tflops"] = flops_per_sec / 1e12
            if self._peak:
                out["perf/mfu"] = flops_per_sec / self._peak
        return out


def save_png(path: str | Path, image: np.ndarray) -> None:
    """Write an (H, W, 3) float [0,1] image as PNG."""
    from PIL import Image  # noqa: PLC0415

    arr = np.clip(np.asarray(image), 0.0, 1.0)
    Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8)).save(Path(path))
