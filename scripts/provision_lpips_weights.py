#!/usr/bin/env python
"""Provision calibrated LPIPS-alex weights for torch_nerf_tpu.

The reference scores LPIPS through torchmetrics' pretrained alex variant
(``/root/reference/torch_nerf/src/utils/metrics/rgb_metrics.py:19-43``).
This build re-implements the metric (``torch_nerf_tpu/lpips.py``) but ships
no weights — they are pretrained data with no source in a zero-egress
container. On any machine WITH the two public checkpoints below, this
script converts them into the single portable ``.npz`` that
``torch_nerf_tpu.lpips.load_weights`` consumes, after which ``evaluate``
prints LPIPS automatically.

Required source checkpoints (both public):

1. torchvision AlexNet backbone
   URL:  https://download.pytorch.org/models/alexnet-owt-7be5be79.pth
   file: alexnet-owt-7be5be79.pth  (~244 MB)
   hash: SHA256 prefix ``7be5be79`` — embedded in the filename per
         torch.hub convention and verified by
         ``torch.hub.load_state_dict_from_url(..., check_hash=True)``.

2. LPIPS v0.1 calibrated ``lin`` weights (Zhang et al. 2018)
   URL:  https://github.com/richzhang/PerceptualSimilarity/raw/master/
         lpips/weights/v0.1/alex.pth
   file: alex.pth  (~6 KB; keys ``lin0.model.1.weight`` .. ``lin4``)
   The ``lpips`` pip package and torchmetrics both ship this exact file;
   any state dict containing ``lin{0..4}`` 1x1-conv weights works.

Usage:

    # checkpoints already in ~/.cache/torch/hub/checkpoints/ (torch hub):
    python scripts/provision_lpips_weights.py

    # or point at a directory holding both files:
    python scripts/provision_lpips_weights.py --src /path/to/ckpts

    # or (network permitting) download them first:
    python scripts/provision_lpips_weights.py --download

    export LPIPS_WEIGHTS=~/.cache/torch_nerf_tpu/lpips_alex.npz

Verification: the script refuses to write an npz unless both pieces were
found, all five lin vectors are non-negative (the LPIPS v0.1 calibration
constraint), and a smoke evaluation produces LPIPS(img, img) == 0 and
LPIPS(img, noisy) > 0.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from torch_nerf_tpu.lpips import (  # noqa: E402
    export_weights_npz,
    load_weights,
    lpips_alex,
)

BACKBONE_URL = "https://download.pytorch.org/models/alexnet-owt-7be5be79.pth"
LIN_URL = (
    "https://github.com/richzhang/PerceptualSimilarity/raw/master/"
    "lpips/weights/v0.1/alex.pth"
)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument(
        "--src",
        default=None,
        help="directory holding alexnet-owt-7be5be79.pth and alex.pth "
        "(default: the torch-hub cache)",
    )
    ap.add_argument(
        "--out",
        default=str(Path.home() / ".cache" / "torch_nerf_tpu" / "lpips_alex.npz"),
        help="output .npz path (default: %(default)s)",
    )
    ap.add_argument(
        "--download",
        action="store_true",
        help="fetch both checkpoints into the torch-hub cache first "
        "(needs network egress + torch)",
    )
    args = ap.parse_args()

    if args.download:
        import torch  # noqa: PLC0415

        torch.hub.load_state_dict_from_url(BACKBONE_URL, check_hash=True)
        # the lin file has no hash in its name; torch still caches it
        torch.hub.load_state_dict_from_url(LIN_URL, file_name="alex.pth")

    if args.src:
        os.environ["LPIPS_WEIGHTS"] = args.src
    weights = load_weights()
    if weights is None:
        print(
            "ERROR: could not assemble calibrated weights.\n"
            f"Place both checkpoints (see --help) in "
            f"{args.src or '~/.cache/torch/hub/checkpoints/'} and rerun.",
            file=sys.stderr,
        )
        return 1

    for i, lin in enumerate(weights.lins):
        if np.any(lin < 0):
            print(
                f"ERROR: lin{i} has negative entries — not the LPIPS v0.1 "
                "calibration (did a random/test npz shadow the real one?).",
                file=sys.stderr,
            )
            return 1

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(np.float32)
    same = lpips_alex(img, img, weights)
    diff = lpips_alex(img, noisy, weights)
    if not (abs(same) < 1e-6 and diff > 0):
        print(
            f"ERROR: smoke check failed (LPIPS(img,img)={same}, "
            f"LPIPS(img,noisy)={diff}).",
            file=sys.stderr,
        )
        return 1

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    export_weights_npz(weights, str(out))
    print(f"wrote {out}")
    print(f"smoke check: LPIPS(img, img)=0.0, LPIPS(img, noisy)={diff:.4f}")
    print(f"activate with: export LPIPS_WEIGHTS={out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
