"""Neural field networks: the classic NeRF MLP and Instant-NGP."""

from torch_nerf_tpu.models import nerf

__all__ = ["nerf"]
