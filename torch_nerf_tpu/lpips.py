"""LPIPS (Learned Perceptual Image Patch Similarity), AlexNet variant.

Full re-implementation of the metric the reference wraps via torchmetrics
(``/root/reference/torch_nerf/src/utils/metrics/rgb_metrics.py:19-43``):
AlexNet feature taps (relu1..relu5), per-channel unit normalization, squared
difference, calibrated 1x1 ``lin`` convolutions, spatial mean, tap sum —
exactly Zhang et al. 2018's ``lpips(net='alex')`` forward pass, written
against ``jax.lax`` convolutions so it runs on CPU or TPU.

**Weights are data, not code.** This container has no network egress and no
pretrained checkpoints, so the module LOADS weights rather than shipping
them. Provide them through any of (checked in order):

1. ``$LPIPS_WEIGHTS`` — path to a ``.npz`` produced by
   :func:`export_weights_npz`, or to a directory holding the two torch
   checkpoints below.
2. ``~/.cache/torch/hub/checkpoints/`` — the standard torch-hub cache:
   ``alexnet-owt-7be5be79.pth`` (torchvision backbone) plus any of the LPIPS
   ``lin`` checkpoints (``alex.pth`` from richzhang/PerceptualSimilarity, or
   a torchmetrics/lpips-package state dict containing ``lin*`` keys).

When weights are present, numbers match torchmetrics'
``LearnedPerceptualImagePatchSimilarity(net_type='alex')`` (same math, same
weights). When absent, callers get ``None`` and must label the metric
unavailable — there is deliberately NO uncalibrated fallback: round 1's
uniform-weight approximation produced numbers that looked like LPIPS but
were not comparable to any published table (VERDICT.md "What's missing" #4).
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

# torchvision AlexNet `features` layout: (out_ch, kernel, stride, pad) for
# the five conv layers; maxpool(3, 2) after conv1 and conv2.
_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_POOL_AFTER = (0, 1)  # conv indices followed by maxpool(3, stride 2)
# input scaling of Zhang et al.'s ScalingLayer (applied to [-1, 1] images)
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


class LPIPSWeights:
    """Backbone conv kernels/biases + calibrated lin weights (numpy)."""

    def __init__(self, convs: List[Tuple[np.ndarray, np.ndarray]], lins: List[np.ndarray]):
        if len(convs) != 5 or len(lins) != 5:
            raise ValueError("LPIPS-alex needs 5 conv layers and 5 lin weights")
        self.convs = convs  # [(Oc, Ic, k, k) f32, (Oc,) f32] per layer
        self.lins = lins  # (C,) non-negative per tap


def _find_checkpoint_dir() -> List[Path]:
    paths = []
    env = os.environ.get("LPIPS_WEIGHTS")
    if env:
        paths.append(Path(env))
    paths.append(Path.home() / ".cache" / "torch" / "hub" / "checkpoints")
    paths.append(Path.home() / ".cache" / "torch_nerf_tpu")
    return [p for p in paths if p.exists()]


def _load_torch_state(path: Path) -> Optional[Dict[str, np.ndarray]]:
    try:
        import torch  # noqa: PLC0415

        state = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(state, "state_dict"):
            state = state.state_dict()
        return {k: np.asarray(v, dtype=np.float32) for k, v in state.items()}
    except Exception:
        return None


def _extract_backbone(state: Dict[str, np.ndarray]) -> Optional[List[Tuple[np.ndarray, np.ndarray]]]:
    convs = []
    for i, layer_idx in enumerate((0, 3, 6, 8, 10)):
        w = state.get(f"features.{layer_idx}.weight")
        b = state.get(f"features.{layer_idx}.bias")
        if w is None:  # torchmetrics prefixes with net.features / net.net
            hits = [k for k in state if re.search(rf"features\.{layer_idx}\.weight$", k)]
            if hits:
                w = state[hits[0]]
                b = state[hits[0].replace("weight", "bias")]
        if w is None or w.shape[0] != _CONVS[i][0]:
            return None
        convs.append((w, b))
    return convs


def _extract_lins(state: Dict[str, np.ndarray]) -> Optional[List[np.ndarray]]:
    lins: List[Optional[np.ndarray]] = [None] * 5
    for k, v in state.items():
        m = re.search(r"lin(\d)\.(?:model\.1\.)?weight$", k)
        if m and int(m.group(1)) < 5:
            lins[int(m.group(1))] = np.asarray(v, dtype=np.float32).reshape(-1)
    if any(l is None for l in lins):
        return None
    return lins  # type: ignore[return-value]


def export_weights_npz(weights: LPIPSWeights, path: str) -> None:
    """Bundle backbone + lin weights into one portable .npz."""
    arrs = {}
    for i, (w, b) in enumerate(weights.convs):
        arrs[f"conv{i}_w"] = w
        arrs[f"conv{i}_b"] = b
    for i, l in enumerate(weights.lins):
        arrs[f"lin{i}"] = l
    np.savez(path, **arrs)


def _load_npz(path: Path) -> Optional[LPIPSWeights]:
    try:
        data = np.load(path)
        convs = [
            (data[f"conv{i}_w"].astype(np.float32), data[f"conv{i}_b"].astype(np.float32))
            for i in range(5)
        ]
        lins = [data[f"lin{i}"].astype(np.float32) for i in range(5)]
        return LPIPSWeights(convs, lins)
    except Exception:
        return None


def load_weights() -> Optional[LPIPSWeights]:
    """Locate and load calibrated LPIPS-alex weights, or None."""
    env = os.environ.get("LPIPS_WEIGHTS")
    if env and env.endswith(".npz") and Path(env).exists():
        return _load_npz(Path(env))

    backbone = None
    lins = None
    for d in _find_checkpoint_dir():
        if d.is_file():
            d = d.parent
        for f in sorted(d.glob("*.npz")):
            w = _load_npz(f)
            if w is not None:
                return w
        for f in sorted(d.glob("*.pth")) + sorted(d.glob("*.pt")):
            state = _load_torch_state(f)
            if state is None:
                continue
            backbone = backbone or _extract_backbone(state)
            lins = lins or _extract_lins(state)
    if backbone is not None and lins is not None:
        return LPIPSWeights(backbone, lins)
    return None


# ---------------------------------------------------------------------------
# forward pass (jax.lax convs; CPU or TPU)


def _features(x, weights: LPIPSWeights):
    """Tap activations (relu1..relu5) for NCHW input in LPIPS scaling."""
    import jax  # noqa: PLC0415
    import jax.numpy as jnp  # noqa: PLC0415

    taps = []
    for i, ((w, b), (_, _, stride, pad)) in enumerate(zip(weights.convs, _CONVS)):
        x = jax.lax.conv_general_dilated(
            x,
            jnp.asarray(w),
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + jnp.asarray(b).reshape(1, -1, 1, 1)
        x = jnp.maximum(x, 0.0)
        taps.append(x)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
            )
    return taps


def lpips_alex(pred: np.ndarray, target: np.ndarray, weights: LPIPSWeights) -> float:
    """Calibrated LPIPS between (H, W, 3) images in [0, 1].

    Matches ``torchmetrics.image.lpip.LearnedPerceptualImagePatchSimilarity
    (net_type='alex', normalize=True)`` given the same weights.
    """
    import jax.numpy as jnp  # noqa: PLC0415

    def prep(img):
        x = jnp.asarray(img, dtype=jnp.float32) * 2.0 - 1.0  # [0,1] -> [-1,1]
        x = (x - _SHIFT) / _SCALE
        return x.transpose(2, 0, 1)[None]  # NCHW

    taps_a = _features(prep(pred), weights)
    taps_b = _features(prep(target), weights)

    total = 0.0
    for fa, fb, lin in zip(taps_a, taps_b, weights.lins):
        na = fa / jnp.sqrt(jnp.sum(fa**2, axis=1, keepdims=True) + 1e-10)
        nb = fb / jnp.sqrt(jnp.sum(fb**2, axis=1, keepdims=True) + 1e-10)
        diff2 = (na - nb) ** 2
        # calibrated 1x1 conv (C -> 1), then spatial mean
        weighted = jnp.sum(diff2 * jnp.asarray(lin).reshape(1, -1, 1, 1), axis=1)
        total += float(jnp.mean(weighted))
    return total
