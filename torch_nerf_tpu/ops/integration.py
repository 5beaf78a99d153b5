"""Volume-rendering quadrature (alpha compositing) along rays.

Functional replacement for the reference's ``QuadratureIntegrator``
(``/root/reference/torch_nerf/src/renderer/integrators/quadrature_integrator.py:9-67``),
implementing the emission-absorption quadrature of Max (1995):

    T_i   = exp(-sum_{j<i} sigma_j * delta_j)   (exclusive prefix scan)
    alpha = 1 - exp(-sigma_i * delta_i)
    w_i   = T_i * alpha_i
    C     = sum_i w_i * c_i

The per-ray sample axis S is small (<= 256) and lives entirely on-chip, so a
plain ``cumsum`` over the last axis is optimal — XLA fuses the whole chain
(mul, scan, exp, weighted reduce) into a couple of VPU loops. For a
hypothetical sample-axis-sharded variant the same math factors into
per-shard scans plus one cross-chip exclusive scan of the shard sums (see
``parallel/`` design notes).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def composite(
    sigma: jnp.ndarray, radiance: jnp.ndarray, delta: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Integrate density/radiance along rays.

    Args:
        sigma: (N, S) densities.
        radiance: (N, S, 3) RGB radiance at each sample.
        delta: (N, S) interval lengths (last entry typically the 1e8
            sentinel from ``ops.sampling.t_deltas``).

    Returns:
        ``(rgb (N, 3), weights (N, S))`` — weights feed hierarchical
        sampling, matching ``quadrature_integrator.py:41-65``.
    """
    sigma_delta = sigma * delta

    # exclusive prefix sum of sigma*delta -> transmittance
    accum = jnp.cumsum(sigma_delta, axis=-1)
    exclusive = jnp.concatenate(
        [jnp.zeros_like(accum[..., :1]), accum[..., :-1]], axis=-1
    )
    transmittance = jnp.exp(-exclusive)

    alpha = 1.0 - jnp.exp(-sigma_delta)
    weights = transmittance * alpha

    rgb = jnp.sum(weights[..., None] * radiance, axis=-2)
    return rgb, weights
