"""Freeze the torch parity oracle into committed golden fixtures.

Runs the restated-reference torch model of ``tests/test_torch_parity.py``
(architecture transcribed from ``/root/reference/torch_nerf/src/network/
nerf.py:49-119``) on fixed inputs and dumps weights + inputs + outputs +
gradients to ``tests/fixtures/torch_golden.npz``. The fixture-driven tests
(``tests/test_golden_fixtures.py``) then check the JAX implementation with
no torch at runtime, and a transcription change in the oracle cannot
silently move the goalposts — re-generating the fixture is an explicit,
reviewable act:

    python scripts/experiments/dump_torch_golden.py
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from test_torch_parity import (  # noqa: E402
    TorchNeRF,
    torch_composite,
    torch_positional_encoding,
)


def main() -> None:
    out = {}
    feat_dim, pos_dim, view_dim = 64, 15, 9
    torch.manual_seed(0)
    tmodel = TorchNeRF(pos_dim, view_dim, feat_dim)
    for k, v in tmodel.state_dict().items():
        out[f"sd/{k}"] = v.detach().numpy()

    # 1) raw MLP forward
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(128, pos_dim)).astype(np.float32)
    dirs = rng.normal(size=(128, view_dim)).astype(np.float32)
    sigma, rgb = tmodel(torch.from_numpy(pos), torch.from_numpy(dirs))
    out.update(
        mlp_pos=pos, mlp_dirs=dirs,
        mlp_sigma=sigma.detach().numpy(), mlp_rgb=rgb.detach().numpy(),
    )

    # 2) full render on fixed rays/samples (encode -> MLP -> composite)
    L_pos, L_dir = 2, 1
    rng = np.random.default_rng(1)
    n_rays, n_samples = 32, 16
    o = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    ts = np.sort(rng.uniform(2.0, 6.0, size=(n_rays, n_samples)).astype(np.float32), -1)
    to, td, tt = map(torch.from_numpy, (o, d, ts))
    pts = to[:, None] + tt[..., None] * td[:, None]
    dirs_b = td[:, None].expand(-1, n_samples, -1)
    delta = torch.diff(torch.cat([tt, 1e8 * torch.ones(n_rays, 1)], -1), dim=-1)
    t_sig, t_rad = tmodel(
        torch_positional_encoding(pts.reshape(-1, 3), L_pos),
        torch_positional_encoding(dirs_b.reshape(-1, 3), L_dir),
    )
    render_rgb, render_w = torch_composite(
        t_sig.reshape(n_rays, n_samples), t_rad.reshape(n_rays, n_samples, 3), delta
    )
    out.update(
        render_o=o, render_d=d, render_ts=ts,
        render_rgb=render_rgb.detach().numpy(), render_w=render_w.detach().numpy(),
        render_L=np.asarray([L_pos, L_dir]),
    )

    # 3) pixel gradient w.r.t. fc_in.weight
    rng = np.random.default_rng(2)
    gpos = rng.normal(size=(64, pos_dim)).astype(np.float32)
    gdirs = rng.normal(size=(64, view_dim)).astype(np.float32)
    gdelta = rng.uniform(0.05, 0.2, size=(8, 8)).astype(np.float32)
    gs, gr = tmodel(torch.from_numpy(gpos), torch.from_numpy(gdirs))
    gpix, _ = torch_composite(gs.reshape(8, 8), gr.reshape(8, 8, 3), torch.from_numpy(gdelta))
    gpix.mean().backward()
    out.update(
        grad_pos=gpos, grad_dirs=gdirs, grad_delta=gdelta,
        grad_fc_in_w=tmodel.fc_in.weight.grad.numpy(),
    )

    dest = REPO / "tests" / "fixtures" / "torch_golden.npz"
    os.makedirs(dest.parent, exist_ok=True)
    np.savez_compressed(dest, **out)
    print(f"wrote {dest} ({dest.stat().st_size / 1024:.0f} KiB, {len(out)} arrays)")


if __name__ == "__main__":
    main()
