"""Multi-chip parallelism over `jax.sharding` device meshes.

The reference is strictly single-GPU (SURVEY.md §2.2: no torch.distributed /
NCCL anywhere); this package is the TPU-native scaling story designed from
scratch:

* **Ray (data) parallelism** — the first-class axis. The global ray batch is
  sharded over the ``data`` mesh axis, parameters are replicated, and XLA
  lowers the gradient all-reduce onto ICI (within a slice) / DCN (across
  slices) automatically from the sharding annotations.
* **Tensor parallelism** — optional ``model`` axis for the MLP, Megatron
  -style alternating column/row-parallel linear layers (one psum per pair).
  At 256-wide it is bandwidth-bound and off by default; it exists so the
  same code scales to wider fields.
* **Sample-axis parallelism** (the NeRF analogue of sequence parallelism):
  the per-ray transmittance is an exclusive prefix scan of ``sigma * delta``
  — partitioning the sample axis S requires a cross-chip exclusive scan of
  per-shard sums plus local scans (ring-attention-style). S <= 256 fits VMEM
  trivially, so this variant is not the default; ``sample_axis.
  make_sample_sharded_composite`` implements the decomposition for S beyond
  on-chip capacity.
"""

from torch_nerf_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_image_train_step,
    make_sharded_render,
    make_sharded_train_step,
    nerf_param_spec,
    replicate_state,
)
from torch_nerf_tpu.parallel.sample_axis import (
    composite_shard,
    make_sample_sharded_composite,
)

__all__ = [
    "composite_shard",
    "make_mesh",
    "make_sample_sharded_composite",
    "make_sharded_image_train_step",
    "make_sharded_render",
    "make_sharded_train_step",
    "nerf_param_spec",
    "replicate_state",
]
