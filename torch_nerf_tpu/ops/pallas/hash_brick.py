"""Corner-SHARED brick hash grid: one gathered line per (point, level).

The quality/speed tension this layout resolves (NGP_QUALITY.json): the
reference's per-corner hashing (``/root/reference/torch_nerf/src/network/
instant_ngp.py:397-478``) shares every lattice feature between the 8 voxels
that touch it — which is why it generalizes to novel views — but costs 8
gathered rows per (point, level) (10.9k rays/s through ``hash_corner``).
The voxel-packed layout gathers ONE row but stores each lattice corner once
PER VOXEL; the copies are independent parameters and novel-view PSNR drops
4.1-5.7 dB. This layout keeps the one-row gather AND (most of) the sharing:

* A brick is a 4x4x4 patch of LATTICE SITES covering a 3x3x3 block of
  voxels: site ``(sx, sy, sz)`` of brick ``b`` is lattice point
  ``3*b + s``. Bricks overlap by one site plane per axis (stride 3), so a
  voxel with floor corner ``v`` always finds all 8 corners inside the
  single brick ``floor(v/3)`` — corners never straddle bricks, hence ONE
  gather. At F=2 the 64 sites fill exactly one 128-lane table row
  (lane = ((sx*4 + sy)*4 + sz)*F + f).
* Sharing: all voxels inside one brick read the same site rows, and
  interior sites (2/3 of coordinates per axis) are stored exactly once.
  Only sites on the stride planes (coordinate = 0 mod 3) are duplicated
  between neighboring bricks — a discontinuity surface every 3rd lattice
  plane instead of EVERY voxel face (a 9x reduction in discontinuity
  density vs packed, with 3^3-voxel coupling inside each brick).
* Bricks are spatial-hashed with the reference's Teschner primes
  (``instant_ngp.py:558-568`` semantics, applied at brick granularity) into
  ``T_b = 2^log * F / 128`` rows per level — the SAME parameter budget as
  the reference layout.

Kernels mirror ``ops.pallas.hash_fold`` (see that header for measured
rates): VMEM-resident folded tables, SMEM index streams prepped in XLA,
in-kernel weight lines, one placement matmul per level, level-interleaved
backward scatter over ``group`` accumulator refs.

The per-lane trilinear weight: lane (s, f)'s weight is
``wx(sx) * wy(sy) * wz(sz)`` where ``w_axis(s)`` is ``span - frac`` at the
voxel's floor site, ``frac`` at the ceil site, and 0 elsewhere — the
reference's |opposite - scaled| select form (``instant_ngp.py:442-475``),
including the all-zero-at-integral-coordinates quirk (span = 0).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torch_nerf_tpu.models.hash_math import HASH_PRIMES
from torch_nerf_tpu.ops.pallas.hash_fold import _place, _placement_matrix

LANES = 128
BRICK_EDGE = 4  # sites per axis; stride = BRICK_EDGE - 1
STRIDE = BRICK_EDGE - 1

_PRIMES_I32 = tuple(
    int(np.array(p, dtype=np.uint32).view(np.int32)) for p in HASH_PRIMES
)


class BrickCfg(NamedTuple):
    """Static configuration (hashable for custom_vjp)."""

    feat_dim: int  # F; BRICK_EDGE^3 * F must equal 128
    num_bricks: int  # T_b = rows per level; must be a power of two
    num_level: int
    use_kernel: bool
    interpret: bool
    tile: int
    group: int = 8
    place_bf16: bool = True
    fwd_unroll: int = 64
    bwd_unroll: int = 4


def bricks_per_level(log_max_entry_per_level: int, feat_dim: int) -> int:
    """Rows per level at the reference parameter budget 2^log * F floats."""
    total = (2**log_max_entry_per_level) * feat_dim
    if total % LANES != 0:
        raise ValueError(
            f"2^{log_max_entry_per_level} * F={feat_dim} must fill whole "
            f"128-lane rows"
        )
    return total // LANES


@functools.lru_cache(maxsize=None)
def _expand_consts(num_level: int, feat_dim: int):
    """Constants for the batched weight-line pipeline (numpy, host-built).

    ``e_mat`` (L, 4L): broadcasts a per-level column to its 4 site-coordinate
    lanes. ``exp[axis]`` (L*4L, 128): block ``l`` is the 0/1 selection matrix
    taking the (tile, 4L) per-axis weight array to level ``l``'s (tile, 128)
    weight factor — exp_l[(lv, j), lane] = [lv == l][site_axis(lane) == j].
    """
    lanes4 = 4 * num_level
    e_mat = np.zeros((num_level, lanes4), np.float32)
    for lv in range(num_level):
        e_mat[lv, lv * 4 : (lv + 1) * 4] = 1.0
    lane = np.arange(LANES)
    site = lane // feat_dim
    e = BRICK_EDGE
    s_axis = (site // (e * e), (site // e) % e, site % e)
    exp = []
    for axis in range(3):
        m = np.zeros((num_level * lanes4, LANES), np.float32)
        for lv in range(num_level):
            for j in range(BRICK_EDGE):
                m[lv * lanes4 + lv * 4 + j, :] = s_axis[axis] == j
        exp.append(m)
    return e_mat, exp[0], exp[1], exp[2]


def _weight_batch(coords, res_row, e_mat, split_bf16: bool):
    """Per-axis trilinear site weights for ALL levels: 3 x (tile, 4L).

    Lane (lv, j) of axis a holds the reference's axis weight of site
    coordinate ``j`` at level ``lv``:

        wa = max(0, span - |(j - local) - frac|)

    which is BIT-equal to the reference's select form
    (``instant_ngp.py:442-475``): at j == local it is span - frac exactly;
    at j == local + 1 it is span - (1 - frac) = frac when span == 1 (1 - frac
    is exact by Sterbenz); elsewhere it clamps to 0 — including the
    all-zero-at-integral-coordinates quirk (span = 0).

    ``split_bf16``: emit (hi, lo) bf16 pairs summing to the f32 weight to
    2^-17 relative — the level-expansion matmuls then run at the MXU's bf16
    rate with f32 accumulation (one (tile, 8L) @ (8L, 128) matmul per axis
    per level instead of a 17-op VPU chain). False (interpret/CPU) keeps
    exact f32 operands.
    """
    lanes4 = e_mat.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, lanes4), 1)
    j = (lane % BRICK_EDGE).astype(jnp.float32)
    outs = []
    for axis in range(3):
        scaled = coords[:, axis : axis + 1] * res_row  # (tile, L)
        v = jnp.floor(scaled)
        span = jnp.ceil(scaled) - v  # 0 when scaled is integral
        frac = scaled - v
        # brick coordinate: float division keeps floor-division semantics
        # for negatives exactly (|v| < 2^22 so v/3 floors correctly in f32)
        b = jnp.floor(v / float(STRIDE))
        local = v - float(STRIDE) * b  # in [0, STRIDE]

        def bcast(x):
            return jnp.dot(x, e_mat, preferred_element_type=jnp.float32)

        d = (j - bcast(local)) - bcast(frac)
        wa = jnp.maximum(bcast(span) - jnp.abs(d), 0.0)  # (tile, 4L) f32
        if split_bf16:
            hi = wa.astype(jnp.bfloat16)
            lo = (wa - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            outs.append(jnp.concatenate([hi, lo], axis=-1))  # (tile, 8L)
        else:
            outs.append(wa)
    return outs


def _expand_arrays(num_level: int, feat_dim: int, split_bf16: bool):
    """Kernel-input expansion matrices. Split mode doubles each level block
    ([M; M], bf16) so the (hi | lo) weight pair contracts in ONE matmul with
    f32 accumulation — exact reconstruction of the f32 weights to 2^-17."""
    _, ex, ey, ez = _expand_consts(num_level, feat_dim)
    lanes4 = 4 * num_level
    out = []
    for m in (ex, ey, ez):
        blocks = m.reshape(num_level, lanes4, LANES)
        if split_bf16:
            blocks = np.concatenate([blocks, blocks], axis=1)
        out.append(
            jnp.asarray(
                blocks.reshape(-1, LANES),
                dtype=jnp.bfloat16 if split_bf16 else jnp.float32,
            )
        )
    return out


def _level_wline(wa3, exp_refs, level, krows):
    """Level ``level``'s (tile, 128) trilinear weight line from the batched
    per-axis weights: one selection matmul per axis + two multiplies."""
    factors = []
    for wa, exp_ref in zip(wa3, exp_refs):
        m = exp_ref[pl.ds(level * krows, krows), :]
        factors.append(jnp.dot(wa, m, preferred_element_type=jnp.float32))
    return factors[0] * factors[1] * factors[2]


def prep_indices(coords, resolutions, cfg: BrickCfg):
    """Tile-major folded line indices: (num_tiles * L * tile,) int32 x2
    (forward absolute; backward group-local — the hash_fold layout)."""
    n = coords.shape[0]
    num_tiles = n // cfg.tile
    primes = jnp.asarray(HASH_PRIMES, dtype=jnp.uint32)

    h = jnp.zeros((cfg.num_level, n), dtype=jnp.uint32)
    for axis in range(3):
        scaled = resolutions[:, None] * coords[None, :, axis]
        v = jnp.floor(scaled)
        b = jnp.floor(v / float(STRIDE))
        h = jnp.bitwise_xor(h, b.astype(jnp.int32).astype(jnp.uint32) * primes[axis])
    row = jnp.bitwise_and(h.astype(jnp.int32), jnp.int32(cfg.num_bricks - 1))
    levels = jnp.arange(cfg.num_level, dtype=jnp.int32)[:, None]
    idx_fwd = row + levels * cfg.num_bricks
    idx_bwd = row + (levels // cfg.group) * cfg.num_bricks

    def tilemajor(x):
        return (
            x.reshape(cfg.num_level, num_tiles, cfg.tile)
            .transpose(1, 0, 2)
            .reshape(num_tiles * cfg.num_level * cfg.tile)
        )

    return tilemajor(idx_fwd), tilemajor(idx_bwd)


# ---------------------------------------------------------------------------
# forward


def _fwd_kernel(
    res_row_ref, e_ref, ex_ref, ey_ref, ez_ref, idx_ref, coords_ref,
    table_ref, out_ref, rows_ref, *, cfg,
):
    """One point-tile, all levels: one gathered row per (point, level).

    The trilinear weight lines are formed by the batched pipeline (module
    docstring): per-axis site weights for ALL levels once per tile
    (``_weight_batch``), then per level one selection matmul per axis + two
    multiplies — replacing the former 17-op-per-level VPU chain that was the
    measured 47-of-82-ms bound of the encode (BENCH_NGP_r04 roofline).
    """
    tile = cfg.tile
    unroll = cfg.fwd_unroll if tile % cfg.fwd_unroll == 0 else 1
    coords = coords_ref[:].astype(jnp.float32)
    split = cfg.place_bf16
    wa3 = _weight_batch(coords, res_row_ref[:], e_ref[:], split)
    krows = 4 * cfg.num_level * (2 if split else 1)
    exp_refs = (ex_ref, ey_ref, ez_ref)

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
        wline = _level_wline(wa3, exp_refs, level, krows)
        prod = rows_ref[:] * wline
        return acc + _place(prod, level, cfg.feat_dim, transpose=False, bf16=cfg.place_bf16)

    out_ref[:] = jax.lax.fori_loop(
        0, cfg.num_level, level_body, jnp.zeros((tile, LANES), jnp.float32)
    )


def _const_vmem_specs(arrays):
    return [
        pl.BlockSpec(a.shape, (lambda i, nd=a.ndim: (0,) * nd), memory_space=pltpu.VMEM)
        for a in arrays
    ]


def _weight_consts(resolutions, cfg: BrickCfg):
    e_mat, _, _, _ = _expand_consts(cfg.num_level, cfg.feat_dim)
    ex, ey, ez = _expand_arrays(cfg.num_level, cfg.feat_dim, cfg.place_bf16)
    res_row = resolutions.astype(jnp.float32).reshape(1, cfg.num_level)
    return [res_row, jnp.asarray(e_mat), ex, ey, ez]


def _fwd_pallas(tables_flat, idx_fwd, coords, resolutions, cfg: BrickCfg):
    n = coords.shape[0]
    num_tiles = n // cfg.tile
    lt = cfg.num_level * cfg.tile
    consts = _weight_consts(resolutions, cfg)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg),
        grid=(num_tiles,),
        in_specs=_const_vmem_specs(consts)
        + [
            pl.BlockSpec((lt,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((cfg.tile, 3), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole tables, resident
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
    )(*consts, idx_fwd, coords, tables_flat)


def _fwd_xla(tables_flat, coords, resolutions, cfg: BrickCfg):
    """Equivalent XLA path (CPU fallback / oracle)."""
    idx, w128 = brick_prep(coords, resolutions, cfg.num_bricks, cfg.feat_dim)
    num_level, n = cfg.num_level, coords.shape[0]
    level_offset = jnp.arange(num_level, dtype=jnp.int32)[:, None] * cfg.num_bricks
    rows = jnp.take(tables_flat, (idx + level_offset).reshape(-1), axis=0)
    prod = (rows * w128.reshape(num_level * n, LANES)).reshape(num_level, n, LANES)
    m = _placement_matrix(0, cfg.feat_dim, transpose=False)[:, : cfg.feat_dim]
    blended = jnp.einsum("lnk,kf->nlf", prod, m)
    out = blended.reshape(n, num_level * cfg.feat_dim)
    return jnp.pad(out, ((0, 0), (0, LANES - num_level * cfg.feat_dim)))


def brick_prep(coords, resolutions, num_bricks: int, feat_dim: int):
    """XLA-side brick lookup prep: (idx (L, N) int32, w128 (L, N, 128)).

    Same math as the in-kernel weight line, vectorized level-major."""
    n = coords.shape[0]
    num_level = resolutions.shape[0]
    primes = jnp.asarray(HASH_PRIMES, dtype=jnp.uint32)
    lane = np.arange(LANES)
    site = lane // feat_dim
    e = BRICK_EDGE
    sites = (
        jnp.asarray(site // (e * e), jnp.float32),
        jnp.asarray((site // e) % e, jnp.float32),
        jnp.asarray(site % e, jnp.float32),
    )

    h = jnp.zeros((num_level, n), dtype=jnp.uint32)
    w128 = jnp.ones((num_level, n, LANES), dtype=jnp.float32)
    for axis in range(3):
        scaled = resolutions[:, None] * coords[None, :, axis]
        v = jnp.floor(scaled)
        span = jnp.ceil(scaled) - v
        frac = scaled - v
        b = jnp.floor(v / float(STRIDE))
        local = (v - float(STRIDE) * b)[..., None]  # (L, N, 1)
        sa = sites[axis][None, None, :]
        wa = jnp.where(sa == local, (span - frac)[..., None], 0.0) + jnp.where(
            sa == local + 1.0, frac[..., None], 0.0
        )
        w128 = w128 * wa
        h = jnp.bitwise_xor(h, b.astype(jnp.int32).astype(jnp.uint32) * primes[axis])
    idx = jnp.bitwise_and(h.astype(jnp.int32), jnp.int32(num_bricks - 1))
    return idx, w128


# ---------------------------------------------------------------------------
# backward


def _bwd_kernel(
    res_row_ref, e_ref, ex_ref, ey_ref, ez_ref, idx_ref, coords_ref, g_ref,
    *rest, cfg,
):
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
    split = cfg.place_bf16
    wa3 = _weight_batch(coords, res_row_ref[:], e_ref[:], split)
    krows = 4 * cfg.num_level * (2 if split else 1)
    exp_refs = (ex_ref, ey_ref, ez_ref)

    def vals_body(level, carry):
        dprod = _place(g, level, cfg.feat_dim, transpose=True, bf16=cfg.place_bf16)
        wline = _level_wline(wa3, exp_refs, level, krows)
        vals_ref[pl.ds(level * tile, tile), :] = dprod * wline
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


def _bwd_pallas(g128, idx_bwd, coords, resolutions, cfg: BrickCfg):
    n = coords.shape[0]
    num_tiles = n // cfg.tile
    lt = cfg.num_level * cfg.tile
    group = cfg.group
    per_group = -(-cfg.num_level // group)
    consts = _weight_consts(resolutions, cfg)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg),
        grid=(num_tiles,),
        in_specs=_const_vmem_specs(consts)
        + [
            pl.BlockSpec((lt,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((cfg.tile, 3), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.tile, LANES), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(group)],
        out_shape=[
            jax.ShapeDtypeStruct((per_group * cfg.num_bricks, LANES), jnp.float32)
            for _ in range(group)
        ],
        scratch_shapes=[pltpu.VMEM((lt, LANES), jnp.float32)],
        compiler_params=None
        if cfg.interpret
        else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=cfg.interpret,
    )(*consts, idx_bwd, coords, g128)
    dtables = [
        outs[l % group][(l // group) * cfg.num_bricks : (l // group + 1) * cfg.num_bricks]
        for l in range(cfg.num_level)
    ]
    return jnp.concatenate(dtables, axis=0)


def _bwd_xla(g128, coords, resolutions, cfg: BrickCfg):
    idx, w128 = brick_prep(coords, resolutions, cfg.num_bricks, cfg.feat_dim)
    num_level, n = cfg.num_level, coords.shape[0]
    dprod = jnp.concatenate(
        [
            jnp.dot(g128, _placement_matrix(level, cfg.feat_dim, transpose=True))
            for level in range(num_level)
        ],
        axis=0,
    )
    vals = dprod * w128.reshape(num_level * n, LANES)
    level_offset = jnp.repeat(
        jnp.arange(num_level, dtype=jnp.int32) * cfg.num_bricks, n
    )
    dflat = jnp.zeros((num_level * cfg.num_bricks, LANES), jnp.float32)
    return dflat.at[idx.reshape(-1) + level_offset].add(vals)


# ---------------------------------------------------------------------------
# custom-VJP encode core (one padded chunk of points)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def encode_brick(cfg: BrickCfg, tables, coords, resolutions):
    """Brick-shared hash encode for one chunk -> (N, 128) feature lines
    (lanes [0, L*F) carry the level-major features, the rest zero).

    ``tables``: (L, T_b, 128); ``coords``: (N, 3), N a multiple of
    ``cfg.tile``. Gradients flow to tables only.
    """
    out, _ = _encode_fwd(cfg, tables, coords, resolutions)
    return out


def _encode_fwd(cfg: BrickCfg, tables, coords, resolutions):
    num_level, t_b, _ = tables.shape
    flat = tables.reshape(num_level * t_b, LANES)
    if cfg.use_kernel:
        idx_fwd, idx_bwd = prep_indices(coords, resolutions, cfg)
        out = _fwd_pallas(flat, idx_fwd, coords, resolutions, cfg)
    else:
        idx_bwd = None
        out = _fwd_xla(flat, coords, resolutions, cfg)
    return out, (tables.shape, coords, resolutions, idx_bwd)


def _encode_bwd(cfg: BrickCfg, residuals, g):
    table_shape, coords, resolutions, idx_bwd = residuals
    g128 = g.astype(jnp.float32)
    if cfg.use_kernel:
        dflat = _bwd_pallas(g128, idx_bwd, coords, resolutions, cfg)
    else:
        dflat = _bwd_xla(g128, coords, resolutions, cfg)
    return (
        dflat.reshape(table_shape),
        jnp.zeros_like(coords),
        jnp.zeros_like(resolutions),
    )


encode_brick.defvjp(_encode_fwd, _encode_bwd)
