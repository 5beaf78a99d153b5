"""LPIPS implementation tests: architecture parity vs a direct torch oracle
(random weights — torch-cpu is available here even though pretrained
checkpoints are not), npz weight round-trip, and the no-weights contract."""

import numpy as np
import pytest

from torch_nerf_tpu.lpips import (
    LPIPSWeights,
    _CONVS,
    export_weights_npz,
    load_weights,
    lpips_alex,
)


def _random_weights(seed=0) -> LPIPSWeights:
    rng = np.random.default_rng(seed)
    convs = []
    in_ch = 3
    for out_ch, k, _, _ in _CONVS:
        w = rng.normal(0, 0.1, (out_ch, in_ch, k, k)).astype(np.float32)
        b = rng.normal(0, 0.05, (out_ch,)).astype(np.float32)
        convs.append((w, b))
        in_ch = out_ch
    lins = [
        np.abs(rng.normal(0, 0.2, (c,)).astype(np.float32))
        for c in (64, 192, 384, 256, 256)
    ]
    return LPIPSWeights(convs, lins)


def _images(seed=1):
    rng = np.random.default_rng(seed)
    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1).astype(np.float32)
    return a, b


def test_identical_images_score_zero():
    w = _random_weights()
    a, _ = _images()
    assert lpips_alex(a, a, w) == pytest.approx(0.0, abs=1e-6)


def test_matches_torch_oracle():
    """jax.lax conv pipeline == the torch formulation of LPIPS-alex."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    w = _random_weights()
    a, b = _images()

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def taps(img):
        x = torch.from_numpy(img).permute(2, 0, 1)[None] * 2.0 - 1.0
        x = (x - shift) / scale
        out = []
        for i, ((cw, cb), (_, _, stride, pad)) in enumerate(zip(w.convs, _CONVS)):
            x = F.conv2d(x, torch.from_numpy(cw), torch.from_numpy(cb), stride, pad)
            x = F.relu(x)
            out.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, 3, 2)
        return out

    total = 0.0
    for fa, fb, lin in zip(taps(a), taps(b), w.lins):
        na = fa / torch.sqrt((fa**2).sum(dim=1, keepdim=True) + 1e-10)
        nb = fb / torch.sqrt((fb**2).sum(dim=1, keepdim=True) + 1e-10)
        d2 = (na - nb) ** 2
        total += float((d2 * torch.from_numpy(lin).view(1, -1, 1, 1)).sum(dim=1).mean())

    ours = lpips_alex(a, b, w)
    np.testing.assert_allclose(ours, total, rtol=1e-4)


def test_npz_roundtrip_and_env_loading(tmp_path, monkeypatch):
    w = _random_weights(seed=2)
    path = tmp_path / "lpips_alex.npz"
    export_weights_npz(w, str(path))

    monkeypatch.setenv("LPIPS_WEIGHTS", str(path))
    loaded = load_weights()
    assert loaded is not None
    a, b = _images(seed=3)
    np.testing.assert_allclose(
        lpips_alex(a, b, loaded), lpips_alex(a, b, w), rtol=1e-6
    )


def test_no_weights_means_unavailable(monkeypatch, tmp_path):
    monkeypatch.setenv("LPIPS_WEIGHTS", str(tmp_path / "missing"))
    monkeypatch.setenv("HOME", str(tmp_path))  # hide any real cache
    assert load_weights() is None


def test_calibrated_weights_activate_evaluate():
    """Auto-activates on machines that provisioned real weights (see
    scripts/provision_lpips_weights.py): the evaluate path must then score
    LPIPS with calibrated-range behavior. Skipped where no weights exist."""
    w = load_weights()
    if w is None:
        pytest.skip("no LPIPS weights provisioned in this environment")
    from torch_nerf_tpu import metrics

    assert metrics.lpips_available()
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(np.float32)
    assert metrics.lpips(img, img) == pytest.approx(0.0, abs=1e-6)
    assert metrics.lpips(img, noisy) > 0.0
