"""Sample-axis (sequence-parallel) volume compositing.

The NeRF analogue of ring-attention's online softmax (SURVEY.md §5.7): the
per-ray transmittance is an *exclusive prefix scan* of ``sigma * delta``
along the sample axis (reference math at
``/root/reference/torch_nerf/src/renderer/integrators/quadrature_integrator.py:41-65``).
For S <= 256 the whole axis fits in VMEM and the plain ``ops.integration.
composite`` is optimal; when S must scale past on-chip capacity (dense
sampling, long unbounded rays) the samples axis itself can be sharded
across chips. The scan then factors into

    1. a local exclusive cumsum within each shard,
    2. one tiny cross-chip exclusive scan of the per-shard *totals*
       (an ``all_gather`` of (N, 1) partials over ICI),
    3. a ``psum`` of the per-shard partial RGB sums.

Communication per ray is O(num_shards) scalars — independent of S — so the
scheme scales like ring attention: compute stays local, collectives move
only reductions.

``composite_shard`` is the per-device function (use under ``shard_map`` with
the sample axis mapped over ``axis_name``); ``make_sample_sharded_composite``
wraps it into a mesh-ready callable.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def composite_shard(
    sigma: jnp.ndarray,
    radiance: jnp.ndarray,
    delta: jnp.ndarray,
    axis_name: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-device compositing over a sample-axis shard.

    Args (all local shards; S_local = S / axis_size):
        sigma: (N, S_local) densities.
        radiance: (N, S_local, 3).
        delta: (N, S_local) interval lengths (the global last interval
            carries the 1e8 sentinel, exactly as in the unsharded op).
        axis_name: mesh axis the sample dimension is sharded over.

    Returns:
        ``(rgb (N, 3) — full sum, replicated; weights (N, S_local) — local
        shard of the global weights)``.
    """
    sigma_delta = sigma * delta

    # 1. local exclusive cumsum — via shift, NOT ``accum - sigma_delta``:
    # the last interval carries the 1e8 delta sentinel, and subtracting it
    # back out of an f32 accumulator destroys the small prefix entirely
    accum = jnp.cumsum(sigma_delta, axis=-1)
    local_exclusive = jnp.concatenate(
        [jnp.zeros_like(accum[..., :1]), accum[..., :-1]], axis=-1
    )
    local_total = accum[..., -1:]  # (N, 1)

    # 2. cross-chip exclusive scan of shard totals (tiny all_gather on ICI)
    axis_size = jax.lax.axis_size(axis_name)
    my_index = jax.lax.axis_index(axis_name)
    totals = jax.lax.all_gather(local_total, axis_name, axis=-1)  # (N, 1, D)
    shard_mask = (
        jnp.arange(axis_size, dtype=jnp.int32) < my_index
    )  # shards strictly before mine
    prefix = jnp.sum(totals[..., 0, :] * shard_mask, axis=-1, keepdims=True)

    transmittance = jnp.exp(-(local_exclusive + prefix))
    alpha = 1.0 - jnp.exp(-sigma_delta)
    weights = transmittance * alpha

    # 3. psum of partial weighted-RGB sums
    partial_rgb = jnp.sum(weights[..., None] * radiance, axis=-2)
    rgb = jax.lax.psum(partial_rgb, axis_name)
    return rgb, weights


def make_sample_sharded_composite(mesh: Mesh, axis_name: str = "samples"):
    """Mesh-level wrapper: global (N, S) arrays sharded over ``axis_name``.

    Returns a jitted callable ``composite(sigma, radiance, delta) ->
    (rgb (N, 3) replicated, weights (N, S) sample-sharded)`` numerically
    identical to ``ops.integration.composite``.
    """
    fn = jax.shard_map(
        functools.partial(composite_shard, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, axis_name), P(None, axis_name, None), P(None, axis_name)),
        out_specs=(P(None, None), P(None, axis_name)),
    )
    return jax.jit(fn)
