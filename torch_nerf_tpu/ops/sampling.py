"""Ray sampling ops: stratified bins, inverse-CDF (hierarchical) sampling.

Functional, fully-batched replacements for the reference's sampler classes
(``/root/reference/torch_nerf/src/renderer/ray_samplers/stratified_sampler.py:12-164``
and ``ray_samplers/utils.py:8-58``). Everything is expressed with static
shapes and vectorized primitives (no ``searchsorted``/``gather`` loops) so
the whole sampler traces into one XLA program:

* the inverse-CDF bin lookup is a broadcast compare + reduce instead of a
  ``searchsorted`` (S_coarse is tiny, so the (N, S_f, S_c) compare is cheap
  and maps onto the VPU);
* the coarse+fine merge uses ``jnp.sort`` over the static sample axis.

All randomness is threaded through explicit ``jax.random`` keys — the
reference's unseeded ``torch.rand_like`` (``stratified_sampler.py:77,109``)
becomes deterministic and reproducible per-step.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Sentinel appended after the last sample so the final interval is effectively
# infinite (``stratified_sampler.py:112-119``).
DELTA_SENTINEL = 1e8


def t_bins(t_near: float, t_far: float, num_bins: int) -> Tuple[jnp.ndarray, float]:
    """Left edges of ``num_bins`` equal partitions of [t_near, t_far].

    Returns ``(bins (num_bins,), bin_size)`` per
    ``stratified_sampler.py:130-164``.
    """
    bins = jnp.linspace(t_near, t_far, num_bins + 1, dtype=jnp.float32)[:-1]
    size = (t_far - t_near) / num_bins
    return bins, size


def stratified_t_samples(
    key: jax.Array,
    num_rays: int,
    t_near: float,
    t_far: float,
    num_samples: int,
) -> jnp.ndarray:
    """One jittered sample per uniform bin, per ray -> ``(N, S)``.

    Matches ``stratified_sampler.py:92-109``: ``t = bin_left + size * U[0,1)``.
    """
    bins, size = t_bins(t_near, t_far, num_samples)
    jitter = jax.random.uniform(key, (num_rays, num_samples), jnp.float32)
    return bins[None, :] + size * jitter


def sample_pdf(
    key: jax.Array,
    bins: jnp.ndarray,
    bin_size: float,
    weights: jnp.ndarray,
    num_samples: int,
) -> jnp.ndarray:
    """Inverse-CDF sampling from per-ray histograms -> ``(N, num_samples)``.

    Matches ``ray_samplers/utils.py:8-58`` including its approximations:
    ``weights + 1e-5`` regularizer, exclusive-cumsum CDF, and uniform jitter
    *within the selected bin* (rather than linear interpolation of the CDF).

    ``bins``: (N, S_c) left bin edges; ``weights``: (N, S_c).

    The reference's ``searchsorted(cdf, u, right=True) - 1`` equals
    ``sum(cdf <= u) - 1`` for sorted ``cdf``; we compute that count with one
    broadcast compare, which is both TPU-friendly and trivially
    differentiable-free (the index path carries no gradient, identical to
    ``searchsorted``).
    """
    u_key, jitter_key = jax.random.split(key)
    u = jax.random.uniform(u_key, (bins.shape[0], num_samples), jnp.float32)
    jitter = jax.random.uniform(jitter_key, (bins.shape[0], num_samples), jnp.float32)
    return sample_pdf_from_uniforms(bins, bin_size, weights, u, jitter)


def sample_pdf_from_uniforms(
    bins: jnp.ndarray,
    bin_size: float,
    weights: jnp.ndarray,
    u: jnp.ndarray,
    jitter: jnp.ndarray,
) -> jnp.ndarray:
    """:func:`sample_pdf` with the uniform draws supplied by the caller.

    Splitting the RNG from the math lets sharded training draw the full
    global uniform batch once (replicated, identical to single-device) and
    shard the rows with the rays — the inverse-CDF transform itself is then
    pure per-ray data flow inside ``shard_map``.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf_inner = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf_inner[..., :1]), cdf_inner[..., :-1]], axis=-1
    )  # exclusive cumsum, shape (N, S_c)

    # index of the bin whose CDF interval contains u: count of cdf entries <= u
    le = (cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32)  # (N, S_f, S_c)
    idx = jnp.sum(le, axis=-1) - 1
    idx = jnp.clip(idx, 0, bins.shape[-1] - 1)

    # bins are uniform left edges (t_bins), so bins[n, i] = bins[n, 0] +
    # i * bin_size — arithmetic instead of a take_along_axis gather (the
    # gather costs 4.3 ms/step at the 4096x128 operating point on v5e; this
    # is free)
    t_start = bins[..., :1] + idx.astype(bins.dtype) * bin_size
    return t_start + bin_size * jitter


def hierarchical_t_samples(
    key: jax.Array,
    weights: jnp.ndarray,
    t_near: float,
    t_far: float,
    num_coarse: int,
    num_fine: int,
) -> jnp.ndarray:
    """Coarse jittered + fine inverse-CDF samples, merged and sorted.

    ``weights``: (N, num_coarse) from the coarse pass (caller should apply
    ``stop_gradient``; the reference never detaches but ``searchsorted``
    breaks the gradient path anyway). Returns ``(N, num_coarse + num_fine)``
    sorted ascending, per ``stratified_sampler.py:57-90``.
    """
    num_rays = weights.shape[0]
    coarse_key, fine_key = jax.random.split(key)

    coarse_jitter = jax.random.uniform(coarse_key, (num_rays, num_coarse), jnp.float32)
    u_key, jitter_key = jax.random.split(fine_key)
    u = jax.random.uniform(u_key, (num_rays, num_fine), jnp.float32)
    fine_jitter = jax.random.uniform(jitter_key, (num_rays, num_fine), jnp.float32)
    return hierarchical_t_samples_from_uniforms(
        weights, t_near, t_far, coarse_jitter, u, fine_jitter
    )


def hierarchical_t_samples_from_uniforms(
    weights: jnp.ndarray,
    t_near: float,
    t_far: float,
    coarse_jitter: jnp.ndarray,
    u: jnp.ndarray,
    fine_jitter: jnp.ndarray,
) -> jnp.ndarray:
    """:func:`hierarchical_t_samples` with caller-supplied uniform draws
    (``coarse_jitter (N, S_c)``, ``u``/``fine_jitter (N, S_f)``) — the
    shard_map-safe core (see :func:`sample_pdf_from_uniforms`)."""
    num_rays, num_coarse = coarse_jitter.shape
    bins, size = t_bins(t_near, t_far, num_coarse)
    bins = jnp.broadcast_to(bins[None, :], (num_rays, num_coarse))
    t_coarse = bins + size * coarse_jitter

    t_fine = sample_pdf_from_uniforms(bins, size, weights, u, fine_jitter)

    return jnp.sort(jnp.concatenate([t_coarse, t_fine], axis=-1), axis=-1)


def t_deltas(t_samples: jnp.ndarray) -> jnp.ndarray:
    """``delta_i = t_{i+1} - t_i`` with a 1e8 sentinel for the last interval.

    Matches ``stratified_sampler.py:112-119``.
    """
    tail = jnp.full_like(t_samples[..., :1], DELTA_SENTINEL)
    padded = jnp.concatenate([t_samples, tail], axis=-1)
    return jnp.diff(padded, axis=-1)


def points_along_rays(
    ray_origin: jnp.ndarray, ray_dir: jnp.ndarray, t_samples: jnp.ndarray
) -> jnp.ndarray:
    """Sample-point coordinates ``o + t * d`` -> ``(N, S, 3)``.

    (``stratified_sampler.py:121-126``.)
    """
    return ray_origin[:, None, :] + t_samples[..., None] * ray_dir[:, None, :]
