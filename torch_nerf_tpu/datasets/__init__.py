"""Dataset loaders: Blender synthetic, LLFF, and the procedural test scene."""

from torch_nerf_tpu.datasets import blender, llff, synthetic
from torch_nerf_tpu.datasets.blender import PosedImages, load_blender
from torch_nerf_tpu.datasets.llff import llff_holdout_index, llff_t_bounds, load_llff

__all__ = [
    "PosedImages",
    "blender",
    "llff",
    "llff_holdout_index",
    "llff_t_bounds",
    "load_blender",
    "load_llff",
    "synthetic",
]
