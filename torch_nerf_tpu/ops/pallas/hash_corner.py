"""Reference-parity hash-grid encode as Pallas kernels: per-CORNER gathers.

The ``table_layout="hash"`` grid reproduces the reference's multiresolution
hash encoding exactly (``/root/reference/torch_nerf/src/network/
instant_ngp.py:397-478``): every (point, level) hashes its voxel's EIGHT
lattice corners independently (Teschner-prime XOR, ``:558-568``), so
adjacent voxels share lattice features — the structural property the fast
voxel-packed layouts trade away (measured at -4.1..-5.7 dB on novel views,
NGP_QUALITY.json). Until round 3 this layout ran through XLA's gather
(~1.3k rays/s at the production operating point — index-rate bound); these
kernels run the same math through the scalar-gather machinery of
``ops.pallas.hash_fold`` at its measured ~4 cycles/row floor.

Design (shared with ``hash_fold``, see that module's header for the
measured rates):

* The (L, T, F) table — the SAME parameter array the reference holds, no
  re-layout of the trainable state — is viewed lane-FOLDED via a pure
  reshape: flat corner-row ``r`` (= level*T + hash) keeps its F features at
  line ``r // fold``, lanes ``[F*(r%fold), F*(r%fold)+F)`` with
  ``fold = 128 // F``. All L levels stay VMEM-resident (67 MB at the
  reference capacity).
* There are ``L*8`` (level, corner) pseudo-streams. Line indices for the
  scalar loops are precomputed in XLA (one vectorized uint32 chain) and
  DMA'd tile-wise into SMEM; the in-line SLOT and the trilinear corner
  weight are recomputed in-kernel from the raw coordinates ((tile, 1)
  integer/VPU chains that hide under the gather loop).
* Forward, per (tile, level): 8 corner gather sweeps; each gathered row is
  masked to its slot lanes and weighted (``w_c`` at lanes
  ``[F*slot, F*slot+F)``), corners accumulate into one (tile, 128) buffer,
  then ONE placement matmul per level routes the blended features to output
  lanes ``[l*F, (l+1)*F)`` — 16 MXU matmuls per tile, not 128.
* Backward: one transposed placement per level extracts dL/dfeature, each
  corner's update row is the extraction masked to its slot lanes times
  ``w_c``, and the scatter-accumulate walks LEVELS fastest with the
  gradient table split over ``group`` accumulator refs (level l in ref
  ``l % group``) — consecutive read-modify-writes hit different refs and
  pipeline (the hash_fold r3 design). Same-row collisions (two corners of
  one point hashing together) stay correct because Mosaic preserves program
  order within a ref.

Gradients flow to the tables only, like the reference (trilinear weights
are functions of the non-trainable coordinates).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torch_nerf_tpu.models.hash_math import CORNERS, HASH_PRIMES

LANES = 128


class CornerCfg(NamedTuple):
    """Static configuration (hashable for custom_vjp)."""

    feat_dim: int
    num_entries: int  # T = rows per level; must be a power of two
    num_level: int
    use_kernel: bool
    interpret: bool
    tile: int  # points per grid step
    group: int = 8  # backward accumulator interleave factor
    place_bf16: bool = True
    fwd_unroll: int = 64  # forward gather-loop unroll (rows per iteration)


def _placement_matrix(level, feat_dim: int, transpose: bool) -> jnp.ndarray:
    """P_l[j, k] = [k == l*F + (j % F)] (see hash_fold._placement_matrix)."""
    jdim, kdim = (1, 0) if transpose else (0, 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), jdim)
    k = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), kdim)
    return (k == level * feat_dim + j % feat_dim).astype(jnp.float32)


def _place(x, level, feat_dim, transpose, bf16):
    mat = _placement_matrix(level, feat_dim, transpose)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    return jnp.dot(x.astype(dt), mat.astype(dt), preferred_element_type=jnp.float32)


_PRIMES_I32 = tuple(
    int(np.array(p, dtype=np.uint32).view(np.int32)) for p in HASH_PRIMES
)


def _level_geometry(coords, res):
    """Per-axis (floor, span, frac) (tile, 1) f32 for one level's voxel."""
    geom = []
    for axis in range(3):
        scaled = coords[:, axis : axis + 1] * res
        floor = jnp.floor(scaled)
        span = jnp.ceil(scaled) - floor  # 0 when scaled is integral
        geom.append((floor, span, scaled - floor))
    return geom


def _corner_weight_slot(geom, corner, num_entries: int, fold: int):
    """(w_c (tile,1) f32, slot (tile,1) int32) for one corner of one level.

    ``w_c`` is the reference trilinear weight |opposite - scaled| in select
    form; ``slot`` is the in-line position of the corner's hashed row
    (``row % fold``; T is a multiple of fold, so the level offset drops).
    """
    w = None
    h = None
    for axis in range(3):
        floor, span, frac = geom[axis]
        bit = float(corner[axis])
        wa = frac if bit > 0.5 else span - frac
        w = wa if w is None else w * wa
        vert = floor + bit * span
        # int32 multiply wraps exactly like uint32 multiply + reinterpret
        vi = vert.astype(jnp.int32) * jnp.int32(_PRIMES_I32[axis])
        h = vi if h is None else jnp.bitwise_xor(h, vi)
    # power-of-two modulo == bitwise AND (non-negative, matching jnp.mod)
    row = jnp.bitwise_and(h, jnp.int32(num_entries - 1))
    return w, jnp.bitwise_and(row, jnp.int32(fold - 1))


def prep_indices(coords, resolutions, cfg: CornerCfg):
    """Folded line indices, tile-major: (num_tiles * L*8 * tile,) int32 x2.

    Forward indices are absolute (level-offset) lines into the resident
    folded table; backward indices are group-local (level l's block sits at
    ``(l // group) * lines_per_level`` inside accumulator ref ``l % group``).
    In-tile layout is pseudo-level-major: index ``(pl, j)`` at ``pl*tile+j``.
    """
    fold = LANES // cfg.feat_dim
    lines_per_level = cfg.num_entries // fold
    n = coords.shape[0]
    num_tiles = n // cfg.tile
    num_pl = cfg.num_level * 8
    primes = jnp.asarray(HASH_PRIMES, dtype=jnp.uint32)
    corner_bits = jnp.asarray(np.tile(CORNERS, (cfg.num_level, 1)))  # (L*8, 3)
    res_pl = jnp.repeat(resolutions, 8)  # (L*8,)

    h = jnp.zeros((num_pl, n), dtype=jnp.uint32)
    for axis in range(3):
        scaled = res_pl[:, None] * coords[None, :, axis]  # (L*8, N)
        floor = jnp.floor(scaled)
        span = jnp.ceil(scaled) - floor
        vert = floor + corner_bits[:, axis : axis + 1] * span
        h = jnp.bitwise_xor(h, vert.astype(jnp.int32).astype(jnp.uint32) * primes[axis])
    row = jnp.bitwise_and(h.astype(jnp.int32), jnp.int32(cfg.num_entries - 1))
    line = row // fold  # (L*8, N) level-local
    levels = jnp.arange(num_pl, dtype=jnp.int32)[:, None] // 8
    idx_fwd = line + levels * lines_per_level
    idx_bwd = line + (levels // cfg.group) * lines_per_level

    def tilemajor(x):
        return (
            x.reshape(num_pl, num_tiles, cfg.tile)
            .transpose(1, 0, 2)
            .reshape(num_tiles * num_pl * cfg.tile)
        )

    return tilemajor(idx_fwd), tilemajor(idx_bwd)


# ---------------------------------------------------------------------------
# forward


def _fwd_kernel(res_ref, idx_ref, coords_ref, table_ref, out_ref, rows_ref, *, cfg):
    """One point-tile, ALL (level, corner) streams.

    res_ref: (L,) SMEM f32 level resolutions.
    idx_ref: (L*8*tile,) SMEM absolute folded line ids, pseudo-level-major.
    coords_ref: (tile, 3) VMEM raw coordinates.
    table_ref: (L*T*F/128, 128) VMEM — all levels' folded tables, resident.
    out_ref: (tile, 128) VMEM; rows_ref: (tile, 128) VMEM scratch.

    Measured at the production operating point (524k pts, L16F2 2^19,
    tile=512, unroll=64): 356M gathered rows/s forward, 428M scattered
    rows/s backward — ~2.6 scalar cycles/row, the issue floor for the
    3-op (SMEM idx load, row load, row store) gather body. A second
    scratch buffer alternating per corner (WAR-breaking double buffer)
    measured exactly equal: Mosaic already pipelines across the hazard.
    """
    tile = cfg.tile
    fold = LANES // cfg.feat_dim
    unroll = cfg.fwd_unroll if tile % cfg.fwd_unroll == 0 else 1
    coords = coords_ref[:].astype(jnp.float32)
    lane_group = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) // cfg.feat_dim

    def level_body(level, acc):
        geom = _level_geometry(coords, res_ref[level])
        level_acc = jnp.zeros((tile, LANES), jnp.float32)
        for c in range(8):
            base = (level * 8 + c) * tile

            def body(j, carry, base=base):
                off = base + j * unroll
                for k in range(unroll):
                    rows_ref[pl.ds(j * unroll + k, 1), :] = table_ref[
                        pl.ds(idx_ref[off + k], 1), :
                    ]
                return carry

            jax.lax.fori_loop(0, tile // unroll, body, 0)
            w_c, slot = _corner_weight_slot(geom, CORNERS[c], cfg.num_entries, fold)
            wline = jnp.where(slot == lane_group, w_c, 0.0)  # (tile, 128)
            level_acc = level_acc + rows_ref[:] * wline
        return acc + _place(level_acc, level, cfg.feat_dim, False, cfg.place_bf16)

    out_ref[:] = jax.lax.fori_loop(
        0, cfg.num_level, level_body, jnp.zeros((tile, LANES), jnp.float32)
    )


def _fwd_pallas(tables_folded, idx_fwd, coords, resolutions, cfg: CornerCfg):
    n = coords.shape[0]
    num_tiles = n // cfg.tile
    plt = cfg.num_level * 8 * cfg.tile
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # resolutions (L,), whole
            pl.BlockSpec((plt,), lambda t: (t,), memory_space=pltpu.SMEM),
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
    )(resolutions.astype(jnp.float32), idx_fwd, coords, tables_folded)


# ---------------------------------------------------------------------------
# backward


def _bwd_kernel(res_ref, idx_ref, coords_ref, g_ref, *rest, cfg):
    """One point-tile: vector update-row build, interleaved scatter-adds."""
    group_refs = rest[: cfg.group]
    vals_ref = rest[cfg.group]
    tile = cfg.tile
    fold = LANES // cfg.feat_dim
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for ref in group_refs:
            ref[:] = jnp.zeros_like(ref)

    coords = coords_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    lane_group = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) // cfg.feat_dim

    def vals_body(level, carry):
        geom = _level_geometry(coords, res_ref[level])
        dprod = _place(g, level, cfg.feat_dim, True, cfg.place_bf16)
        for c in range(8):
            w_c, slot = _corner_weight_slot(geom, CORNERS[c], cfg.num_entries, fold)
            wline = jnp.where(slot == lane_group, w_c, 0.0)
            vals_ref[pl.ds((level * 8 + c) * tile, tile), :] = dprod * wline
        return carry

    jax.lax.fori_loop(0, cfg.num_level, vals_body, 0)

    num_level = cfg.num_level

    def body(j, carry):
        # levels walk fastest so consecutive RMWs cycle the group refs
        for c in range(8):
            for level in range(num_level):
                sj = (level * 8 + c) * tile + j
                group_refs[level % cfg.group][pl.ds(idx_ref[sj], 1), :] += vals_ref[
                    pl.ds(sj, 1), :
                ]
        return carry

    jax.lax.fori_loop(0, tile, body, 0)


def _bwd_pallas(g128, idx_bwd, coords, resolutions, cfg: CornerCfg):
    n = coords.shape[0]
    num_tiles = n // cfg.tile
    fold = LANES // cfg.feat_dim
    lines_per_level = cfg.num_entries // fold
    plt = cfg.num_level * 8 * cfg.tile
    group = cfg.group
    per_group = -(-cfg.num_level // group)  # levels per accumulator ref
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((plt,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((cfg.tile, 3), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.tile, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(group)
        ],  # whole grad-table groups, revisited across the grid
        out_shape=[
            jax.ShapeDtypeStruct((per_group * lines_per_level, LANES), jnp.float32)
            for _ in range(group)
        ],
        scratch_shapes=[pltpu.VMEM((plt, LANES), jnp.float32)],
        compiler_params=None
        if cfg.interpret
        else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=cfg.interpret,
    )(resolutions.astype(jnp.float32), idx_bwd, coords, g128)
    dtables = [
        outs[l % group][(l // group) * lines_per_level : (l // group + 1) * lines_per_level]
        for l in range(cfg.num_level)
    ]
    return jnp.concatenate(dtables, axis=0)


# ---------------------------------------------------------------------------
# custom-VJP encode core (one padded chunk of points)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def encode_corner(cfg: CornerCfg, tables, coords, resolutions):
    """Reference-parity hash encode for one chunk -> (N, 128) feature lines
    (lanes [0, L*F) carry the level-major features, the rest are zero).

    ``tables``: (L, T, F) — the reference parameter layout, unchanged;
    ``coords``: (N, 3) raw coordinates, N a multiple of ``cfg.tile``.
    """
    out, _ = _encode_fwd(cfg, tables, coords, resolutions)
    return out


def _folded_view(tables, cfg: CornerCfg):
    num_level, num_entries, feat_dim = tables.shape
    return tables.reshape(num_level * num_entries * feat_dim // LANES, LANES)


def _encode_fwd(cfg: CornerCfg, tables, coords, resolutions):
    idx_fwd, idx_bwd = prep_indices(coords, resolutions, cfg)
    out = _fwd_pallas(_folded_view(tables, cfg), idx_fwd, coords, resolutions, cfg)
    return out, (tables.shape, coords, resolutions, idx_bwd)


def _encode_bwd(cfg: CornerCfg, residuals, g):
    table_shape, coords, resolutions, idx_bwd = residuals
    dflat = _bwd_pallas(g.astype(jnp.float32), idx_bwd, coords, resolutions, cfg)
    return (
        dflat.reshape(table_shape),
        jnp.zeros_like(coords),
        jnp.zeros_like(resolutions),
    )


encode_corner.defvjp(_encode_fwd, _encode_bwd)
