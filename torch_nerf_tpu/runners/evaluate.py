"""Evaluation CLI: metrics between two image directories.

Mirrors ``/root/reference/torch_nerf/runners/evaluate.py:17-43`` (PSNR/SSIM
always; LPIPS when pretrained weights are locally available).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from torch_nerf_tpu import metrics


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Compare two image directories.")
    parser.add_argument("dir1", type=str, help="Path to the first directory.")
    parser.add_argument("dir2", type=str, help="Path to the second directory.")
    args = parser.parse_args(argv)

    out = metrics.compare_directories(Path(args.dir1), Path(args.dir2))
    if "lpips" in out:
        print(f"LPIPS: {out['lpips']:.4f}")
    else:
        print(
            "LPIPS: unavailable — no calibrated weights found (set "
            "$LPIPS_WEIGHTS or place alexnet/lin checkpoints in "
            "~/.cache/torch/hub/checkpoints/; see torch_nerf_tpu/lpips.py)"
        )
    print(f"PSNR: {out['psnr']:.4f}")
    print(f"SSIM: {out['ssim']:.4f}")
    print("Done.")


if __name__ == "__main__":
    main()
