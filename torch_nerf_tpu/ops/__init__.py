"""Compute ops: sampling, integration, and Pallas TPU kernels."""

from torch_nerf_tpu.ops import integration, sampling

__all__ = ["integration", "sampling"]
