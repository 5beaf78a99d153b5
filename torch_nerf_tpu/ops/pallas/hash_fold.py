"""Lane-folded voxel-packed hash-grid encode: Pallas gather+blend forward,
Pallas interleaved scatter-accumulate backward, trilinear weights computed
IN-KERNEL.

Why this design (all rates measured on this repo's TPU v5e,
``scripts/experiments/ngp_rates.py`` and step profiles):

* Gather/scatter on TPU is bound by SCALAR ISSUE RATE, not bytes: XLA
  row-gather runs ~0.4-155M rows/s and XLA scatter-add ~9M rows/s regardless
  of row width; a Pallas per-row loop against VMEM-resident tables reaches
  ~180M rows/s gathering (~5 scalar cycles/row — the dynamic-slice floor)
  and ~150-210M rows/s scatter-accumulating depending on how well the
  read-modify-write hazard chain is broken.
* The packed table (one row = all 8 corner features of one voxel,
  ``models/instant_ngp.py``) is stored FOLDED: ``fold = 128 // (8F)``
  packed rows share one 128-lane line — shape (L, rows/fold, 128), zero
  padding anywhere. The total table footprint is 64 MiB at the reference
  capacity (any L*F with L * 2^19 * F = 16.8M params), so ALL levels stay
  VMEM-resident for the whole kernel.
* Trilinear corner weights are recomputed INSIDE the kernel from the raw
  (tile, 3) coordinates (a handful of VPU ops per level that hide entirely
  under the scalar gather loop). Round-1 materialized the (L, N, 128)
  weight-line stream in HBM instead: 8.6 GB per build, built twice per step
  (forward + backward recompute) — ~83 ms/step of pure bandwidth, all gone.
* The hash itself is int32 vector math (Teschner primes, wraparound
  multiply, power-of-two modulo == bitwise AND, exactly the semantics of
  ``models.hash_math.packed_prep``). Only the row index for the scalar
  dynamic-slice loop must come from SMEM, so the (L, N) index array is
  computed once in XLA (cheap (L, N) int chain), pre-offset (absolute rows
  for the forward, group-local rows for the backward) and DMA'd tile-wise.
* Backward RMW interleaving: consecutive updates from the SAME level chase
  each other through one accumulator (serial hazard). Instead each grid
  step processes its point-tile for ALL levels, the inner loop walks levels
  fastest, and levels are round-robined over ``group`` separate accumulator
  refs (l % group) — consecutive RMWs hit different refs, so Mosaic can
  pipeline them. The refs jointly hold exactly one copy of the gradient
  table (no duplication; VMEM = table size), and the upstream-gradient
  stream is read ONCE per tile instead of once per (tile, level).

The reference's hash path for comparison:
``/root/reference/torch_nerf/src/network/instant_ngp.py:397-478`` (8 corner
gathers per (point, level), Python loop over levels).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torch_nerf_tpu.models.hash_math import HASH_PRIMES, packed_prep

LANES = 128


class FoldCfg(NamedTuple):
    """Static configuration for the folded encode (hashable for custom_vjp)."""

    feat_dim: int
    num_rows: int  # packed (pre-fold) rows per level; must be a power of two
    num_level: int
    use_kernel: bool
    interpret: bool
    tile: int  # points per grid step
    group: int = 4  # backward accumulator interleave factor
    bwd_unroll: int = 4  # backward scalar-loop unroll (points per iteration)
    # placement/extraction matmul dtype on the MXU. The 16 (tile,128)x(128,
    # 128) lane-placement matmuls per tile cost ~11 ms/step in f32 at the
    # reference operating point but ~1.4 ms in bf16 (exact 0/1 matrices; the
    # only rounding is the f32->bf16 cast of the blended products, on par
    # with the bf16 MLP they feed).
    place_bf16: bool = True


def fold_factor(feat_dim: int) -> int:
    if feat_dim not in (1, 2, 4, 8, 16):
        raise ValueError(f"feat_dim must divide 16 lanes of 8 corners, got {feat_dim}")
    return LANES // (8 * feat_dim)


def _placement_matrix(level, feat_dim: int, transpose: bool) -> jnp.ndarray:
    """P_l[j, k] = [k == l*F + (j % F)] — scatters the F features blended on
    lane group ``j % F`` to output lanes [l*F, (l+1)*F). ``transpose`` builds
    P_l^T for the backward extraction. ``level`` may be a traced scalar."""
    jdim, kdim = (1, 0) if transpose else (0, 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), jdim)
    k = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), kdim)
    return (k == level * feat_dim + j % feat_dim).astype(jnp.float32)


def _place(x, level, feat_dim, transpose, bf16):
    mat = _placement_matrix(level, feat_dim, transpose)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    return jnp.dot(x.astype(dt), mat.astype(dt), preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# in-kernel trilinear weight lines


def _lane_corner_bits(feat_dim: int):
    """(1, 128) bool corner-bit masks per axis: lane = 8F*slot + F*c + f.

    Built from iota ops (not host constants — Pallas kernels may not capture
    traced-in arrays). Membership sets transcribe ``hash_math.CORNERS``'s
    fff, cff, fcf, ffc, ccf, cfc, fcc, ccc ordering.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    corner = (lane % (8 * feat_dim)) // feat_dim
    ceil_corners = ((1, 4, 5, 7), (2, 4, 6, 7), (3, 5, 6, 7))  # per axis
    masks = []
    for axis in range(3):
        m = None
        for c in ceil_corners[axis]:
            eq = corner == c
            m = eq if m is None else jnp.logical_or(m, eq)
        masks.append(m)
    return masks


def _weight_line(coords, res, off, feat_dim: int, num_rows: int):
    """Slot-positioned trilinear weight line (tile, 128) for one level,
    computed from the raw (tile, 3) coords — identical math to
    ``hash_math.packed_prep`` (weights |opposite - scaled| in select form,
    slot from the power-of-two packed-row hash). ``off`` shifts the scaled
    coordinates (the dual-grid half-voxel stagger; 0 for plain packed)."""
    fold = LANES // (8 * feat_dim)
    bits = _lane_corner_bits(feat_dim)
    primes = HASH_PRIMES

    w = None
    h = None
    for axis in range(3):
        scaled = coords[:, axis : axis + 1] * res + off  # (tile, 1)
        floor = jnp.floor(scaled)
        span = jnp.ceil(scaled) - floor  # 0 when scaled is integral
        frac = scaled - floor
        wa = jnp.where(bits[axis], frac, span - frac)  # (tile, 128)
        w = wa if w is None else w * wa
        # int32 multiply wraps exactly like the uint32 multiply + int32
        # reinterpret of hash_math.spatial_hash (two's complement)
        prime_i32 = int(np.array(primes[axis], dtype=np.uint32).view(np.int32))
        vi = floor.astype(jnp.int32) * jnp.int32(prime_i32)
        h = vi if h is None else jnp.bitwise_xor(h, vi)
    # power-of-two modulo on the int32 hash == bitwise AND (two's complement
    # makes this match jnp.mod for negative hashes too)
    row = jnp.bitwise_and(h, jnp.int32(num_rows - 1))  # (tile, 1)
    slot = jnp.bitwise_and(row, jnp.int32(fold - 1))
    slot_of_lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) // (8 * feat_dim)
    return jnp.where(slot == slot_of_lane, w, 0.0)


def prep_indices(coords, resolutions, offsets, cfg: FoldCfg):
    """Folded line indices for the kernels, tile-major: (num_tiles * L * tile,).

    ``absolute=True`` layout adds ``l * t_fold`` so the forward loop indexes
    the all-level resident table with zero per-row address math; the backward
    gets group-local rows (``(l // group) * t_fold`` within accumulator ref
    ``l % group``). Returns ``(idx_fwd, idx_bwd)`` int32.
    """
    fold = fold_factor(cfg.feat_dim)
    t_fold = cfg.num_rows // fold
    n = coords.shape[0]
    num_tiles = n // cfg.tile
    primes = jnp.asarray(HASH_PRIMES, dtype=jnp.uint32)

    idx = jnp.zeros((cfg.num_level, n), dtype=jnp.uint32)
    for axis in range(3):
        scaled = resolutions[:, None] * coords[None, :, axis] + offsets[:, None]
        idx = jnp.bitwise_xor(
            idx, jnp.floor(scaled).astype(jnp.int32).astype(jnp.uint32) * primes[axis]
        )
    row = jnp.bitwise_and(idx.astype(jnp.int32), jnp.int32(cfg.num_rows - 1))
    line = row // fold  # (L, N) level-local folded line
    levels = jnp.arange(cfg.num_level, dtype=jnp.int32)[:, None]
    idx_fwd = line + levels * t_fold
    idx_bwd = line + (levels // cfg.group) * t_fold
    # tile-major interleave: (L, nt, tile) -> (nt, L, tile) so one SMEM block
    # per grid step carries every level's rows for that point tile
    def tilemajor(x):
        return (
            x.reshape(cfg.num_level, num_tiles, cfg.tile)
            .transpose(1, 0, 2)
            .reshape(num_tiles * cfg.num_level * cfg.tile)
        )

    return tilemajor(idx_fwd), tilemajor(idx_bwd)


# ---------------------------------------------------------------------------
# forward: gather + blend + lane placement


def _fwd_kernel(res_ref, idx_ref, coords_ref, table_ref, out_ref, rows_ref, *, cfg: FoldCfg):
    """One point-tile, ALL levels: per-row table reads, in-kernel weights.

    res_ref: (2L,) SMEM f32 — level resolutions then level coord offsets.
    idx_ref: (L*tile,) SMEM — absolute folded line ids, level-major in-tile.
    coords_ref: (tile, 3) VMEM raw coordinates.
    table_ref: (L*Tf, 128) VMEM — ALL levels' folded tables, resident.
    out_ref: (tile, 128) VMEM; rows_ref: (tile, 128) VMEM scratch.
    """
    tile = cfg.tile
    unroll = 16 if tile % 16 == 0 else 1
    coords = coords_ref[:].astype(jnp.float32)

    # dynamic loop over levels (NOT python-unrolled: 16 unrolled copies of
    # the weight-line chain left ~100 MB of live vector intermediates for
    # the register allocator to spill)
    def level_body(level, acc):
        base = level * tile

        def body(j, carry):
            off = base + j * unroll
            for k in range(unroll):
                rows_ref[pl.ds(j * unroll + k, 1), :] = table_ref[
                    pl.ds(idx_ref[off + k], 1), :
                ]
            return carry

        jax.lax.fori_loop(0, tile // unroll, body, 0)
        w128 = _weight_line(
            coords, res_ref[level], res_ref[cfg.num_level + level],
            cfg.feat_dim, cfg.num_rows,
        )
        prod = rows_ref[:] * w128
        contrib = _place(prod, level, cfg.feat_dim, transpose=False, bf16=cfg.place_bf16)
        return acc + contrib

    out_ref[:] = jax.lax.fori_loop(
        0, cfg.num_level, level_body, jnp.zeros((tile, LANES), jnp.float32)
    )


def _fwd_pallas(tables, idx_fwd, coords, res_off, cfg: FoldCfg):
    n = coords.shape[0]
    num_tiles = n // cfg.tile
    lt = cfg.num_level * cfg.tile
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # res_off (2L,), whole
            pl.BlockSpec((lt,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((cfg.tile, 3), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole folded tables
        ],
        out_specs=pl.BlockSpec(
            (cfg.tile, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cfg.tile, LANES), jnp.float32)],
        compiler_params=None
        if cfg.interpret
        else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=cfg.interpret,
    )(res_off, idx_fwd, coords, tables)


def _fwd_xla(tables, coords, resolutions, offsets, cfg: FoldCfg):
    num_level, n = cfg.num_level, coords.shape[0]
    t_fold = tables.shape[0] // num_level
    idx_fold, w128 = packed_prep(coords, resolutions, cfg.num_rows, cfg.feat_dim, offsets)
    level_offset = jnp.arange(num_level, dtype=jnp.int32)[:, None] * t_fold
    rows = jnp.take(tables, (idx_fold + level_offset).reshape(-1), axis=0)
    prod = (rows * w128.reshape(num_level * n, LANES)).reshape(num_level, n, LANES)
    # blend lane groups to features, then place level l at lanes [l*F, l*F+F)
    m = _placement_matrix(0, cfg.feat_dim, transpose=False)[:, : cfg.feat_dim]
    blended = jnp.einsum("lnk,kf->nlf", prod, m)
    out = blended.reshape(n, num_level * cfg.feat_dim)
    return jnp.pad(out, ((0, 0), (0, LANES - num_level * cfg.feat_dim)))


# ---------------------------------------------------------------------------
# backward: interleaved scatter-accumulate into group-split gradient tables


def _bwd_kernel(res_ref, idx_ref, coords_ref, g_ref, *rest, cfg: FoldCfg):
    """One point-tile, ALL levels: vector update-row build, interleaved adds.

    The gradient table is split over ``cfg.group`` revisited output refs
    (level l lives in ref l % group at row block l // group); the inner
    scalar loop walks levels fastest so consecutive read-modify-writes hit
    different refs and pipeline instead of chaining.
    """
    group_refs = rest[: cfg.group]
    vals_ref = rest[cfg.group]
    tile = cfg.tile
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for ref in group_refs:
            ref[:] = jnp.zeros_like(ref)

    coords = coords_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)

    def vals_body(level, carry):
        dprod = _place(g, level, cfg.feat_dim, transpose=True, bf16=cfg.place_bf16)
        w128 = _weight_line(
            coords, res_ref[level], res_ref[cfg.num_level + level],
            cfg.feat_dim, cfg.num_rows,
        )
        vals_ref[pl.ds(level * tile, tile), :] = dprod * w128
        return carry

    jax.lax.fori_loop(0, cfg.num_level, vals_body, 0)

    unroll = cfg.bwd_unroll if tile % cfg.bwd_unroll == 0 else 1
    num_level = cfg.num_level

    def body(j, carry):
        off = j * unroll
        for k in range(unroll):
            jj = off + k
            for level in range(num_level):
                sj = level * tile + jj
                group_refs[level % cfg.group][pl.ds(idx_ref[sj], 1), :] += vals_ref[
                    pl.ds(sj, 1), :
                ]
        return carry

    jax.lax.fori_loop(0, tile // unroll, body, 0)


def _bwd_pallas(g128, idx_bwd, coords, res_off, t_fold, cfg: FoldCfg):
    n = coords.shape[0]
    num_tiles = n // cfg.tile
    lt = cfg.num_level * cfg.tile
    group = cfg.group
    per_group = -(-cfg.num_level // group)  # levels per accumulator ref
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((lt,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((cfg.tile, 3), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.tile, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(group)
        ],  # whole grad-table groups, revisited
        out_shape=[
            jax.ShapeDtypeStruct((per_group * t_fold, LANES), jnp.float32)
            for _ in range(group)
        ],
        scratch_shapes=[pltpu.VMEM((lt, LANES), jnp.float32)],
        compiler_params=None
        if cfg.interpret
        else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=cfg.interpret,
    )(res_off, idx_bwd, coords, g128)
    # reassemble level-major: level l = outs[l % group][(l // group) block]
    dtables = [
        outs[l % group][(l // group) * t_fold : (l // group + 1) * t_fold]
        for l in range(cfg.num_level)
    ]
    return jnp.concatenate(dtables, axis=0)


def _bwd_xla(g128, coords, resolutions, offsets, t_fold, cfg: FoldCfg):
    num_level, n = cfg.num_level, coords.shape[0]
    idx_fold, w128 = packed_prep(coords, resolutions, cfg.num_rows, cfg.feat_dim, offsets)
    dprod = jnp.concatenate(
        [
            jnp.dot(g128, _placement_matrix(level, cfg.feat_dim, transpose=True))
            for level in range(num_level)
        ],
        axis=0,
    )  # (L*N, 128) level-major
    vals = dprod * w128.reshape(num_level * n, LANES)
    level_offset = jnp.repeat(jnp.arange(num_level, dtype=jnp.int32) * t_fold, n)
    dflat = jnp.zeros((num_level * t_fold, LANES), jnp.float32)
    return dflat.at[idx_fold.reshape(-1) + level_offset].add(vals)


# ---------------------------------------------------------------------------
# custom-VJP encode core (one padded chunk of points)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def encode_folded(cfg: FoldCfg, tables, coords, resolutions, offsets):
    """Folded voxel-packed hash encode for one chunk -> (N, 128) feature
    lines whose first L*F lanes are the level-major packed features (the
    rest are zero — sized for the 128-lane MLP input, no narrow arrays).

    ``tables``: (L, Tf, 128) folded; ``coords``: (N, 3) with N a multiple of
    ``cfg.tile``; ``resolutions``: (L,); ``offsets``: (L,) scaled-coordinate
    shifts (the dual layout's half-voxel stagger — zeros for plain packed).
    Gradients flow to ``tables`` only (trilinear weights are functions of
    the non-trainable coordinates).
    """
    out, _ = _encode_fwd(cfg, tables, coords, resolutions, offsets)
    return out


def _res_off(resolutions, offsets):
    return jnp.concatenate(
        [resolutions.astype(jnp.float32), offsets.astype(jnp.float32)]
    )


def _encode_fwd(cfg: FoldCfg, tables, coords, resolutions, offsets):
    num_level, t_fold, _ = tables.shape
    if cfg.use_kernel:
        idx_fwd, idx_bwd = prep_indices(coords, resolutions, offsets, cfg)
        out = _fwd_pallas(
            tables.reshape(num_level * t_fold, LANES),
            idx_fwd, coords, _res_off(resolutions, offsets), cfg,
        )
    else:
        idx_bwd = None
        out = _fwd_xla(
            tables.reshape(num_level * t_fold, LANES), coords, resolutions, offsets, cfg
        )
    # the backward's tile-major scatter indices are SAVED (int32, L*N ~ 34 MB
    # at the production operating point) — round 1 recomputed them to avoid
    # holding the far larger (L, N, 128) weight-line stream; with weights now
    # built in-kernel the only residual stream is this index array, and
    # reusing it removes the backward's whole XLA hash-chain + tile-major
    # transpose rebuild from the step's critical path
    return out, (tables.shape, coords, resolutions, offsets, idx_bwd)


def _encode_bwd(cfg: FoldCfg, residuals, g):
    (num_level, t_fold, _), coords, resolutions, offsets, idx_bwd = residuals
    g128 = g.astype(jnp.float32)
    if cfg.use_kernel:
        dtables = _bwd_pallas(
            g128, idx_bwd, coords, _res_off(resolutions, offsets), t_fold, cfg
        )
    else:
        dtables = _bwd_xla(g128, coords, resolutions, offsets, t_fold, cfg)
    return (
        dtables.reshape(num_level, t_fold, LANES),
        jnp.zeros_like(coords),
        jnp.zeros_like(resolutions),
        jnp.zeros_like(offsets),
    )


encode_folded.defvjp(_encode_fwd, _encode_bwd)
