"""torch_nerf_tpu — a TPU-native NeRF framework in JAX/XLA/Pallas.

A from-scratch re-design of the capabilities of DveloperY0115/torch-NeRF
(reference mounted at ``/root/reference``) for TPU hardware: pure-functional
geometry and sampling, one jit-compiled train step, Pallas kernels for the
fused render hot path, and ``jax.sharding`` data/tensor parallelism over
device meshes.
"""

from torch_nerf_tpu import cameras, encoders, fields, renderer, train
from torch_nerf_tpu.cameras import CameraParams
from torch_nerf_tpu.fields import Field, make_nerf_field
from torch_nerf_tpu.renderer import RenderSettings, render_image, render_rays
from torch_nerf_tpu.train import (
    OptimConfig,
    TrainState,
    create_train_state,
    make_image_train_step,
    make_ray_train_step,
)

__version__ = "0.1.0"

__all__ = [
    "CameraParams",
    "Field",
    "OptimConfig",
    "RenderSettings",
    "TrainState",
    "cameras",
    "create_train_state",
    "encoders",
    "fields",
    "make_image_train_step",
    "make_nerf_field",
    "make_ray_train_step",
    "render_image",
    "render_rays",
    "renderer",
    "train",
]
