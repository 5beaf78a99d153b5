"""Lane-folded voxel-packed hash-grid encode: Pallas gather+blend forward,
Pallas VMEM scatter-accumulate backward.

Why this design (all rates measured on this repo's TPU v5e,
``scripts/experiments/ngp_rates.py`` and step profiles):

* Gather/scatter on TPU is bound by INDEX COUNT, not bytes: XLA row-gather
  runs ~155M rows/s and XLA scatter-add ~9M rows/s regardless of row width.
  A Pallas per-row loop against VMEM-resident tables reaches ~530M rows/s
  gathering and ~170M rows/s scatter-accumulating — but only when every
  array involved carries exactly 128 lanes per row.
* So the packed table (one row = all 8 corner features of one voxel,
  ``models/instant_ngp.py``) is stored FOLDED: ``fold = 128 // (8F)``
  packed rows share one 128-lane line — shape (L, rows/fold, 128), zero
  padding anywhere. Folding is a pure reshape of the packed layout; the
  math is bit-identical. The total table footprint is 64 MiB at the
  reference capacity (any L*F with L * 2^19 * F = 16.8M params), so ALL
  levels stay VMEM-resident for the whole kernel.
* Grid is (point-tile, level) with level fastest: the (tile, 128) output
  line block stays resident while the levels sweep, each level adding its
  contribution via one tiny MXU matmul ``prod @ P_l`` with the placement
  matrix P_l[j, k] = [k == l*F + j % F]; level l's F features land on
  output lanes [l*F, (l+1)*F). The gradient kernel reads the (tile, 128)
  upstream line once per tile and extracts each level's slice with the
  transposed placement matmul — no narrow (·, F) arrays, no lane-padded
  intermediates, no transposes anywhere in either direction (narrow
  intermediates cost ~450 ms/step when this ran through XLA select/concat).
* Per-point work in the kernels is ONE dynamic-slice row read (forward) or
  ONE row read-modify-write (backward) per level — the scalar-issue-bound
  minimum; the blend/update vector work hides under the scalar loop.

The reference's hash path for comparison:
``/root/reference/torch_nerf/src/network/instant_ngp.py:397-478`` (8 corner
gathers per (point, level), Python loop over levels).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torch_nerf_tpu.models.hash_math import packed_prep

LANES = 128


class FoldCfg(NamedTuple):
    """Static configuration for the folded encode (hashable for custom_vjp)."""

    feat_dim: int
    num_rows: int  # packed (pre-fold) rows per level
    use_kernel: bool
    interpret: bool
    tile: int
    # True: save idx/w128 as residuals; False: recompute them in the
    # backward. Measured on v5e: recompute wins (holding + re-reading the
    # (L, N, 128) weight lines costs more HBM time than the fused
    # elementwise rebuild — 80.6 vs 73.7 ms/step at L=4, 1M points).
    save_prep: bool = False


def fold_factor(feat_dim: int) -> int:
    if feat_dim not in (1, 2, 4, 8, 16):
        raise ValueError(f"feat_dim must divide 16 lanes of 8 corners, got {feat_dim}")
    return LANES // (8 * feat_dim)


def _placement_matrix(level, feat_dim: int, transpose: bool) -> jnp.ndarray:
    """P_l[j, k] = [k == l*F + (j % F)] — scatters the F features blended on
    lane group ``j % F`` to output lanes [l*F, (l+1)*F). ``transpose`` builds
    P_l^T for the backward extraction."""
    jdim, kdim = (1, 0) if transpose else (0, 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), jdim)
    k = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), kdim)
    return (k == level * feat_dim + j % feat_dim).astype(jnp.float32)


# ---------------------------------------------------------------------------
# forward: gather + blend + lane placement


def _fwd_kernel(idx_ref, w_ref, table_ref, out_ref, rows_ref, *, tile, unroll, feat_dim, t_fold):
    """One (tile, level) instance: per-row table reads, then vector blend.

    idx_ref: (tile,) SMEM — folded row ids, level-local.
    w_ref: (tile, 128) VMEM — slot-positioned corner weights (zero outside
        this point's fold slot, so cross-slot lanes cancel in the blend).
    table_ref: (L*Tf, 128) VMEM — ALL levels' folded tables, resident.
    out_ref: (tile, 128) VMEM — revisited across the level sweep.
    rows_ref: (tile, 128) VMEM scratch.
    """
    level = pl.program_id(1)
    base = level * t_fold

    def body(j, carry):
        off = j * unroll
        for k in range(unroll):
            jj = off + k
            rows_ref[pl.ds(jj, 1), :] = table_ref[pl.ds(base + idx_ref[jj], 1), :]
        return carry

    jax.lax.fori_loop(0, tile // unroll, body, 0)
    prod = rows_ref[:] * w_ref[:]
    contrib = jnp.dot(
        prod, _placement_matrix(level, feat_dim, transpose=False),
        preferred_element_type=jnp.float32,
    )

    @pl.when(level == 0)
    def _():
        out_ref[:] = contrib

    @pl.when(level > 0)
    def _():
        out_ref[:] = out_ref[:] + contrib


def _fwd_pallas(tables, idx_lm, w_lm, num_level, cfg: FoldCfg):
    t_fold = tables.shape[0] // num_level
    n = idx_lm.shape[0] // num_level
    num_tiles = n // cfg.tile
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, tile=cfg.tile, unroll=16 if cfg.tile % 16 == 0 else 1,
            feat_dim=cfg.feat_dim, t_fold=t_fold,
        ),
        grid=(num_tiles, num_level),
        in_specs=[
            pl.BlockSpec(
                (cfg.tile,),
                lambda t, l, n=num_tiles: (l * n + t,),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (cfg.tile, LANES),
                lambda t, l, n=num_tiles: (l * n + t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole folded tables
        ],
        out_specs=pl.BlockSpec(
            (cfg.tile, LANES), lambda t, l: (t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cfg.tile, LANES), jnp.float32)],
        compiler_params=None
        if cfg.interpret
        else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=cfg.interpret,
    )(idx_lm, w_lm, tables)


def _fwd_xla(tables, idx_lm, w_lm, num_level, cfg: FoldCfg):
    t_fold = tables.shape[0] // num_level
    n = idx_lm.shape[0] // num_level
    level_offset = jnp.repeat(jnp.arange(num_level, dtype=jnp.int32) * t_fold, n)
    rows = jnp.take(tables, idx_lm + level_offset, axis=0)
    prod = (rows * w_lm).reshape(num_level, n, LANES)
    # blend lane groups to features, then place level l at lanes [l*F, l*F+F)
    m = _placement_matrix(0, cfg.feat_dim, transpose=False)[:, : cfg.feat_dim]
    blended = jnp.einsum("lnk,kf->nlf", prod, m)
    out = blended.reshape(n, num_level * cfg.feat_dim)
    return jnp.pad(out, ((0, 0), (0, LANES - num_level * cfg.feat_dim)))


# ---------------------------------------------------------------------------
# backward: scatter-accumulate update rows into the folded gradient tables


def _bwd_kernel(idx_ref, w_ref, g_ref, out_ref, vals_ref, *, tile, unroll, feat_dim, t_fold):
    """One (tile, level) instance: vector update-row build, per-row adds.

    The whole gradient table block (L*Tf, 128) is VMEM-resident across the
    entire grid (zeroed once at the first instance, flushed to HBM once at
    the end). Update rows are ``(g128 @ P_l^T) * w128``: the transposed
    placement matmul broadcasts each point's F upstream gradients from
    lanes [l*F, (l+1)*F) onto its lane group, masked/scaled by the
    slot-positioned trilinear weights.
    """
    t = pl.program_id(0)
    level = pl.program_id(1)
    base = level * t_fold

    @pl.when((t == 0) & (level == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dprod = jnp.dot(
        g_ref[:], _placement_matrix(level, feat_dim, transpose=True),
        preferred_element_type=jnp.float32,
    )
    vals_ref[:] = dprod * w_ref[:]

    def body(j, carry):
        off = j * unroll
        for k in range(unroll):
            jj = off + k
            out_ref[pl.ds(base + idx_ref[jj], 1), :] += vals_ref[pl.ds(jj, 1), :]
        return carry

    jax.lax.fori_loop(0, tile // unroll, body, 0)


def _bwd_pallas(g128, idx_lm, w_lm, num_level, t_fold, cfg: FoldCfg):
    n = idx_lm.shape[0] // num_level
    num_tiles = n // cfg.tile
    return pl.pallas_call(
        functools.partial(
            _bwd_kernel, tile=cfg.tile, unroll=8 if cfg.tile % 8 == 0 else 1,
            feat_dim=cfg.feat_dim, t_fold=t_fold,
        ),
        grid=(num_tiles, num_level),
        in_specs=[
            pl.BlockSpec(
                (cfg.tile,),
                lambda t, l, n=num_tiles: (l * n + t,),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (cfg.tile, LANES),
                lambda t, l, n=num_tiles: (l * n + t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (cfg.tile, LANES), lambda t, l: (t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # whole grad tables
        out_shape=jax.ShapeDtypeStruct((num_level * t_fold, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cfg.tile, LANES), jnp.float32)],
        compiler_params=None
        if cfg.interpret
        else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=cfg.interpret,
    )(idx_lm, w_lm, g128)


def _bwd_xla(g128, idx_lm, w_lm, num_level, t_fold, cfg: FoldCfg):
    n = idx_lm.shape[0] // num_level
    dprod = jnp.concatenate(
        [
            jnp.dot(g128, _placement_matrix(level, cfg.feat_dim, transpose=True))
            for level in range(num_level)
        ],
        axis=0,
    )  # (L*N, 128) level-major
    vals = dprod * w_lm
    level_offset = jnp.repeat(jnp.arange(num_level, dtype=jnp.int32) * t_fold, n)
    dflat = jnp.zeros((num_level * t_fold, LANES), jnp.float32)
    return dflat.at[idx_lm + level_offset].add(vals)


# ---------------------------------------------------------------------------
# custom-VJP encode core (one padded chunk of points)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def encode_folded(cfg: FoldCfg, tables, coords, resolutions):
    """Folded voxel-packed hash encode for one chunk -> (N, 128) feature
    lines whose first L*F lanes are the level-major packed features (the
    rest are zero — sized for the 128-lane MLP input, no narrow arrays).

    ``tables``: (L, Tf, 128) folded; ``coords``: (N, 3) with N a multiple of
    ``cfg.tile``; ``resolutions``: (L,). Gradients flow to ``tables`` only
    (trilinear weights are functions of the non-trainable coordinates).
    """
    out, _ = _encode_fwd(cfg, tables, coords, resolutions)
    return out


def _encode_fwd(cfg: FoldCfg, tables, coords, resolutions):
    num_level, t_fold, _ = tables.shape
    n = coords.shape[0]
    idx_fold, w128 = packed_prep(coords, resolutions, cfg.num_rows, cfg.feat_dim)
    idx_lm = idx_fold.reshape(num_level * n)
    w_lm = w128.reshape(num_level * n, LANES)
    fwd = _fwd_pallas if cfg.use_kernel else _fwd_xla
    out = fwd(tables.reshape(num_level * t_fold, LANES), idx_lm, w_lm, num_level, cfg)
    if cfg.save_prep:
        residuals = (tables.shape, coords, resolutions, idx_lm, w_lm)
    else:
        # recompute idx/w128 in bwd instead of holding (L, N, 128) floats
        residuals = (tables.shape, coords, resolutions, None, None)
    return out, residuals


def _encode_bwd(cfg: FoldCfg, residuals, g):
    (num_level, t_fold, _), coords, resolutions, idx_lm, w_lm = residuals
    if not cfg.save_prep:
        n = coords.shape[0]
        idx_fold, w128 = packed_prep(coords, resolutions, cfg.num_rows, cfg.feat_dim)
        idx_lm = idx_fold.reshape(num_level * n)
        w_lm = w128.reshape(num_level * n, LANES)
    g128 = g.astype(jnp.float32)
    bwd = _bwd_pallas if cfg.use_kernel else _bwd_xla
    dtables = bwd(g128, idx_lm, w_lm, num_level, t_fold, cfg)
    return (
        dtables.reshape(num_level, t_fold, LANES),
        jnp.zeros_like(coords),
        jnp.zeros_like(resolutions),
    )


encode_folded.defvjp(_encode_fwd, _encode_bwd)
