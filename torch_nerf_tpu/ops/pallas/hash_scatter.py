"""Pallas scatter-accumulate for hash-table gradients.

XLA's TPU scatter executes at ~9M rows/s regardless of index order or
uniqueness (measured on v5e) — it is the bottleneck of hash-grid training:
the gradient of every table lookup is a scatter-add, and the Instant-NGP
operating point (4096 rays x 256 samples, SURVEY.md §3.5) produces 16M row
updates per step in the packed layout (128M element updates in the
reference layout, ``/root/reference/torch_nerf/src/network/instant_ngp.py:
397-478``).

This kernel holds one level's full gradient table in VMEM (a (T, 8F) f32
block — 32 MiB padded at the production size T=2^16, 8F=16) and streams
update tiles through it, applying the row adds at core clock from VMEM:
measured ~68M rows/s, 7x XLA's scatter. The grid is (level, tile); the
output block is revisited across all tiles of a level and re-zeroed when a
new level's first tile arrives, so one ``pallas_call`` scatters every
level with no host-side loop and no transposes (update streams arrive
point-major as (N, L) / (N, L, W) and are sliced per level by the
BlockSpec index maps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(idx_ref, vals_ref, out_ref, *, tile: int, unroll: int):
    """Accumulate ``vals`` rows into table rows named by ``idx``.

    idx_ref: (tile,) int32 in SMEM — row ids within this level's table.
    vals_ref: (tile, W) in VMEM — update rows.
    out_ref: (1, T, W) in VMEM — this level's gradient table (revisited
        across the tile axis of the grid; zeroed on each level's first tile).

    The row adds inside one unrolled group stay sequential (duplicate row
    ids within a group accumulate correctly); unrolling only amortizes the
    loop control, measured ~1.4x at unroll=4.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(j, carry):
        for k in range(unroll):
            jj = j * unroll + k
            r = idx_ref[jj]
            out_ref[0, pl.ds(r, 1), :] += vals_ref[pl.ds(jj, 1), :]
        return carry

    jax.lax.fori_loop(0, tile // unroll, body, 0)


def scatter_add_per_level(
    idx: jnp.ndarray,
    vals: jnp.ndarray,
    num_rows: int,
    tile: int = 8192,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-level scatter-add -> (L, num_rows, W).

    ``idx``: (N, L) int32 row ids (level-local, in [0, num_rows));
    ``vals``: (N, L, W) f32 update rows. Update j of level l adds
    ``vals[j, l]`` to output row ``[l, idx[j, l]]``.

    Updates are transposed to level-major flat streams so the kernel's
    blocks are a 1-D SMEM index tile and a (tile, W) VMEM row tile — the
    only shapes the Mosaic block checker admits at W < 128.
    """
    n, num_level = idx.shape
    w = vals.shape[-1]
    tile = min(tile, n)
    if n % tile != 0:
        pad = -(-n // tile) * tile - n
        # pad with zero-valued updates to row 0 (adds nothing)
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
        vals = jnp.pad(vals, ((0, pad), (0, 0), (0, 0)))
        n += pad
    num_tiles = n // tile

    idx_lm = idx.T.reshape(num_level * n)  # level-major flat
    vals_lm = jnp.moveaxis(vals, 1, 0).reshape(num_level * n, w)
    unroll = 4 if tile % 4 == 0 else 1

    return pl.pallas_call(
        functools.partial(_scatter_kernel, tile=tile, unroll=unroll),
        grid=(num_level, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (tile,), lambda l, t: (l * num_tiles + t,), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (tile, w), lambda l, t: (l * num_tiles + t, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, num_rows, w), lambda l, t: (l, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_level, num_rows, w), jnp.float32),
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(idx_lm, vals_lm)
