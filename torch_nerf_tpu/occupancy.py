"""Occupancy-grid sample pruning: skip empty space before the hash encode.

The measured roofline of the hash-grid train step (BENCH_NGP_r03.json) is the
encode's scalar gather rate: ~230M dynamic-slice rows/s on the v5e core, with
8 gathered rows per sample point at the production ``packed_dual`` layout.
Once that floor is reached, the only remaining lever is *fewer points* — and
most stratified sample points on a bounded scene sit in empty space, where
the field contributes nothing to the quadrature (``ops/integration.py``).

This module implements the standard Instant-NGP acceleration (Müller et al.
2022 §3 "occupancy grid"; the reference re-implementation has NO counterpart
— its sampler is purely stratified, ``/root/reference/torch_nerf/src/renderer/
ray_samplers/stratified_sampler.py:92-109`` — so this is a strictly additive
TPU-native capability), re-designed for XLA's static-shape model:

* A dense ``R^3`` grid of EMA-max densities covers ``[-bound, bound]^3``.
  Every ``update_every`` steps the field's density is evaluated at one
  jittered point per cell and folded in as ``g = max(decay * g, sigma)`` —
  a running max over jitter positions that also forgets stale occupancy.
* The train step draws the usual ``S`` stratified candidates per ray, looks
  up their cells (ONE gathered row per point, vs 8+ for the encode), and
  keeps a **static** ``K`` of them: all occupied samples when at most ``K``
  are occupied, else ``K`` evenly spaced among the occupied (even spacing —
  not first-K — so truncation never collapses onto the near segment). Slots
  left over are filled with the earliest unoccupied samples, which cost
  encode work but carry near-zero density; they keep gradients alive in
  freshly-pruned regions so occupancy mistakes are recoverable.
* Each kept sample composites with the span of dense intervals it COVERS:
  its own dense delta plus the deltas of every dropped OCCUPIED sample up
  to the next kept one (a prefix-sum difference — see
  :func:`prune_t_samples`). Two regimes fall out of one rule:
  - occupied count <= K: nothing occupied is dropped, every kept delta is
    its dense spacing (``delta_i = t_{i+1} - t_i``, sentinel on the last),
    and the pruned quadrature equals the dense one EXACTLY whenever pruned
    density is zero — error bounded by ``threshold`` alone
    (test: ``tests/test_occupancy.py``);
  - over budget (always during warmup; soft scenes with no empty space):
    the kept samples form a consistent COARSENED quadrature — optical
    depth is preserved instead of undercounted by the keep ratio.
    Measured: 2:1 pruning on the soft procedural scene costs 0.84 dB with
    this rule vs 4.6 dB with naive dense deltas (NGP_QUALITY.json
    `bricked_L16F2_T19_occ64`).

Because ``K`` is static, the step's cost is content-independent: pruning
256 -> 128 samples halves the encode's gathered rows on every step from step
0. The grid only decides *which* K samples survive. Before the first update
(and whenever a point falls outside the grid, which clamps to the border
cell) a fresh grid reads "occupied everywhere" via the ``warmup_steps``
override, so early training sees an unbiased even subsample of the
stratified candidates.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from torch_nerf_tpu.ops import sampling


@dataclasses.dataclass(frozen=True)
class OccupancyConfig:
    """Static pruning configuration (hashable; safe inside jitted closures).

    ``keep_samples`` is the static per-ray sample budget after pruning (the
    compute cost knob). ``warmup_steps`` treats every cell as occupied for
    the first N steps so the grid (initialized to 0) can form; with
    ``update_every=16`` the default gives ~32 update sweeps of evidence
    before pruning trusts the grid.
    """

    resolution: int = 64
    bound: float = 4.0
    update_every: int = 16
    decay: float = 0.95
    threshold: float = 1e-2
    keep_samples: int = 128
    warmup_steps: int = 512
    # hierarchical pipelines only: static budget for the merged coarse+fine
    # sample set of the FINE pass (``keep_samples`` then budgets the coarse
    # candidates). 0 = keep the full merged set unpruned.
    keep_samples_fine: int = 0


def init_grid(cfg: OccupancyConfig) -> jnp.ndarray:
    """Flat ``(R^3,)`` f32 density grid, zero-initialized (see warmup)."""
    return jnp.zeros((cfg.resolution**3,), jnp.float32)


def cell_indices(pts: jnp.ndarray, cfg: OccupancyConfig) -> jnp.ndarray:
    """World points ``(..., 3)`` -> flat cell index, clamped to the border.

    Out-of-bound points share the nearest border cell: conservative early
    (border cells start occupied like everywhere else) and cheap forever
    (no branch; background samples prune once the border empties).
    """
    r = cfg.resolution
    x = (pts + cfg.bound) * (r / (2.0 * cfg.bound))
    i = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, r - 1)
    return (i[..., 0] * r + i[..., 1]) * r + i[..., 2]


def occupied_mask(
    grid: jnp.ndarray, pts: jnp.ndarray, cfg: OccupancyConfig, step: jnp.ndarray
) -> jnp.ndarray:
    """Boolean ``(...,)`` occupancy at world points (warmup forces True)."""
    vals = jnp.take(grid, cell_indices(pts, cfg), axis=0)
    return (vals > cfg.threshold) | (step < cfg.warmup_steps)


def quota_keep_mask(occ: jnp.ndarray, keep: int) -> jnp.ndarray:
    """``(N, S)`` mask of the samples that survive pruning (<= ``keep`` true
    per ray): every occupied sample when their count ``m <= keep``, else
    exactly ``keep`` evenly spaced among the occupied — the r-th occupied
    sample survives iff ``floor(r*keep/m)`` increments. A rank-quota rule:
    pure cumsum/compare arithmetic, no sorting of densities."""
    occ_i = occ.astype(jnp.int32)
    m = jnp.maximum(jnp.sum(occ_i, axis=-1, keepdims=True), 1)
    r = jnp.cumsum(occ_i, axis=-1)  # 1-indexed rank at occupied positions
    return occ & ((r * keep) // m > ((r - 1) * keep) // m)


def select_samples(occ: jnp.ndarray, keep: int) -> jnp.ndarray:
    """Pick ``keep`` sample indices per ray from an ``(N, S)`` occupancy mask.

    Kept samples (``quota_keep_mask``) come first in ascending ray order,
    then the earliest unoccupied samples fill the leftover slots. Returns
    ``(N, keep)`` int32. This index-materializing form exists for tests and
    external callers; the train path uses the gather-free sort in
    :func:`prune_t_samples` (same selection, same ordering).
    """
    n, s = occ.shape
    kept = quota_keep_mask(occ, keep)
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (n, s))
    key = jnp.where(kept, pos, pos + s)
    return jnp.sort(key, axis=-1)[:, :keep] % s


def prune_t_samples(
    grid: jnp.ndarray,
    cfg: OccupancyConfig,
    ray_origin: jnp.ndarray,
    ray_dir: jnp.ndarray,
    t_samples: jnp.ndarray,
    step: jnp.ndarray,
    keep: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense ``(N, S)`` t-samples -> kept ``(t (N, K), delta (N, K))``.

    ``delta`` is each kept sample's COVERED span: its dense interval plus
    the dense intervals of the dropped occupied samples before the next
    kept one (module docstring bullet 3 — exact when pruned density is
    zero, a consistent coarsened quadrature when over budget). ``keep``
    overrides ``cfg.keep_samples`` (the hierarchical pipeline budgets its
    two passes differently).
    """
    keep = cfg.keep_samples if keep is None else keep
    n, s = t_samples.shape
    pts = sampling.points_along_rays(ray_origin, ray_dir, t_samples)
    occ = occupied_mask(grid, pts, cfg, step)
    kept = quota_keep_mask(occ, keep)
    occ_f = occ.astype(t_samples.dtype)

    # Gather-free compaction: co-sort (t, delta) by a key that places kept
    # samples first (each group in ascending ray order) and slice the static
    # K prefix. One multi-operand bitonic sort on the VPU instead of top_k +
    # index sort + two per-row take_along_axis gathers — the gathers lower to
    # index-rate-bound loops on TPU and cost more than the encode they save
    # (measured 43 ms/step of selection overhead at the 4096x256 operating
    # point vs ~4 ms for this sort).
    #
    # Padding samples land AFTER the kept ones rather than interleaved in t
    # order; compositing is insensitive to this because a padding sample's
    # own weight multiplies 1 - exp(-sigma*delta) ~ 0 and its sigma*delta ~ 0
    # contribution to every later transmittance — exactly 0 when pruned
    # density is exactly 0, so the zero-density quadrature equality holds
    # unchanged (tests/test_occupancy.py).
    # Each kept sample's interval ABSORBS the dense deltas of the dropped
    # OCCUPIED samples up to the next kept one (prefix-sum E of delta*occ,
    # differenced at the kept positions after the co-sort). Two regimes:
    # * occupied count <= K: nothing occupied is dropped, so every kept
    #   delta is its dense spacing — the threshold-bounded exactness of the
    #   module docstring, unchanged;
    # * over budget (e.g. warmup, or soft scenes with no empty space): the
    #   kept samples become a consistent COARSENED quadrature — optical
    #   depth is preserved in expectation instead of undercounted by the
    #   keep ratio (the ADVICE-r3 bias: at 2:1 the effective spacing was
    #   halved; measured -11.7 dB on the soft procedural scene flagship before this rule).
    #   Occupied intervals before the FIRST kept sample remain uncovered —
    #   with the even-spacing quota that prefix is at most ~S/K samples.
    dense_delta = sampling.t_deltas(t_samples)
    occupied_delta = dense_delta * occ_f
    # exclusive cumsum by SHIFT, not cumsum-minus-own: subtracting the 1e8
    # sentinel of an occupied last sample would cancel the whole prefix in f32
    e_incl = jnp.cumsum(occupied_delta, axis=-1)  # (N, S)
    e_excl = jnp.concatenate(
        [jnp.zeros_like(e_incl[:, :1]), e_incl[:, :-1]], axis=-1
    )
    e_total = e_incl[:, -1:]

    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (n, s))
    key = jnp.where(kept, pos, pos + s)
    _, t_sel, delta_sel, e_sel = jax.lax.sort(
        (key, t_samples, dense_delta, e_excl), dimension=-1, num_keys=1
    )
    t_sel, delta_sel, e_sel = t_sel[:, :keep], delta_sel[:, :keep], e_sel[:, :keep]

    m = jnp.minimum(jnp.sum(kept, axis=-1, keepdims=True), keep)  # kept count
    slot = jnp.arange(keep, dtype=jnp.int32)[None, :]
    e_next = jnp.concatenate([e_sel[:, 1:], jnp.zeros_like(e_sel[:, :1])], axis=-1)
    # Tail absorption: the LAST kept sample's span runs to e_total, which
    # includes the 1e8 delta sentinel when the final dense sample is occupied
    # but dropped over-budget — its alpha then saturates to ~1 regardless of
    # density. This is the consistent coarsening of the reference's own
    # convention (``stratified_sampler.py:112-119`` gives the dense LAST
    # sample the 1e8 sentinel, so it too absorbs all remaining transmittance
    # whenever sigma > 0); pinning the ray's tail opacity to the last kept
    # occupied sample preserves that semantic, but note it is what makes
    # over-budget pruning lossy on soft scenes with no empty space.
    covered = jnp.where(slot + 1 < m, e_next - e_sel, e_total - e_sel)
    # kept slots get their covered occupied span; padding slots (unoccupied
    # fillers with ~zero density) keep their dense spacing
    delta_out = jnp.where(slot < m, covered, delta_sel)
    return t_sel, delta_out


def scatter_weights_to_bins(
    t_sel: jnp.ndarray,
    weights_sel: jnp.ndarray,
    t_near: float,
    t_far: float,
    num_bins: int,
) -> jnp.ndarray:
    """Pruned coarse weights ``(N, K)`` -> dense per-BIN weights ``(N, S_c)``.

    The hierarchical fine sampler (``sampling.sample_pdf``) draws from a
    histogram over the UNIFORM coarse bins (``stratified_sampler.py:57-90``);
    after pruning, each kept sample still lies inside its original stratified
    bin, so its bin index is recovered arithmetically and its weight placed
    there. Pruned bins get weight 0 — consistent with their (empty-space)
    densities. The scatter is a one-hot contraction, not an index gather.
    """
    bin_size = (t_far - t_near) / num_bins
    idx = jnp.clip(
        jnp.floor((t_sel - t_near) / bin_size).astype(jnp.int32), 0, num_bins - 1
    )  # (N, K) — each kept sample's stratified bin (all distinct per ray)
    onehot = (idx[..., None] == jnp.arange(num_bins, dtype=jnp.int32)).astype(
        weights_sel.dtype
    )  # (N, K, S_c)
    return jnp.einsum("nk,nks->ns", weights_sel, onehot)


def make_density_fn(field, params_key: str = "coarse") -> Callable[..., jnp.ndarray]:
    """``(params, pts (M, 3)) -> sigma (M,)`` through the field's apply.

    Directions enter only the color branch (``models/instant_ngp.py:439``),
    so zeros are passed; the wasted color matmuls are ~6% of the update's
    encode-dominated cost.
    """

    def density(params: Dict[str, Any], pts: jnp.ndarray) -> jnp.ndarray:
        sigma, _ = field.apply(params[params_key], pts, jnp.zeros_like(pts))
        return sigma

    return density


def update_grid(
    grid: jnp.ndarray,
    density_fn: Callable[..., jnp.ndarray],
    params: Dict[str, Any],
    key: jax.Array,
    cfg: OccupancyConfig,
) -> jnp.ndarray:
    """One EMA-max sweep: evaluate sigma at a jittered point per cell.

    ``g = max(decay * g, stop_gradient(sigma))`` — direct evaluation at every
    cell each sweep (not ray-sampled), so a cell whose density the field
    raises is re-marked occupied at the next sweep regardless of whether rays
    currently reach it.
    """
    r = cfg.resolution
    flat = jnp.arange(r**3, dtype=jnp.int32)
    ijk = jnp.stack([(flat // (r * r)) % r, (flat // r) % r, flat % r], axis=-1)
    u = jax.random.uniform(key, (r**3, 3), jnp.float32)
    pts = (ijk.astype(jnp.float32) + u) * (2.0 * cfg.bound / r) - cfg.bound
    sigma = jax.lax.stop_gradient(density_fn(params, pts))
    return jnp.maximum(cfg.decay * grid, sigma.astype(grid.dtype))


def maybe_update_grid(
    grid: jnp.ndarray,
    density_fn: Callable[..., jnp.ndarray],
    params: Dict[str, Any],
    key: jax.Array,
    step: jnp.ndarray,
    cfg: OccupancyConfig,
) -> jnp.ndarray:
    """``update_grid`` every ``update_every`` steps, identity otherwise
    (``lax.cond`` — the sweep's FLOPs are only spent on update steps)."""
    return jax.lax.cond(
        step % cfg.update_every == 0,
        lambda g: update_grid(g, density_fn, params, key, cfg),
        lambda g: g,
        grid,
    )
