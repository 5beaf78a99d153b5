"""Microbenchmarks that set the Instant-NGP hash-grid design on TPU v5e.

All kernels work on the lane-FOLDED packed-table layout: one level's table is
(T8, 128) f32 where each 128-lane row holds 8 packed voxel rows of 16 floats
(8 corners x F=2) — zero lane padding, 4 MiB per level at the reference
capacity (2^19 corner-features => T8 = 8192).

Measured (chained timing; jax.block_until_ready lies on this platform):
  - xla_row_gather      : XLA jnp.take baseline on the folded table
  - pallas_gather       : per-row dynamic-slice reads, unrolled (independent)
  - pallas_scatter_acc1 : read-modify-write rows into ONE VMEM accumulator
  - pallas_scatter_accK : round-robin across K accumulators to break the
                          serial RMW dependency chain, tree-sum at the end

Run on the real TPU: python scripts/experiments/ngp_rates.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T8 = 8192  # folded rows per level (2^19 corner-feats / 8 corners / 8 per row)
N = 1 << 21  # rows per call
TILE = 8192


def _gather_kernel(idx_ref, table_ref, out_ref, *, tile, unroll):
    def body(j, c):
        base = j * unroll
        for k in range(unroll):
            jj = base + k
            out_ref[pl.ds(jj, 1), :] = table_ref[pl.ds(idx_ref[jj], 1), :]
        return c

    jax.lax.fori_loop(0, tile // unroll, body, 0)


@functools.partial(jax.jit, static_argnames=("unroll",))
def pallas_gather(idx, table, unroll=8):
    num_tiles = idx.shape[0] // TILE
    return pl.pallas_call(
        functools.partial(_gather_kernel, tile=TILE, unroll=unroll),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((T8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((idx.shape[0], 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, table)


def _scatter_kernel(idx_ref, vals_ref, out_ref, *accs, tile, k_acc, unroll):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for a in accs:
            a[:] = jnp.zeros_like(a)

    group = k_acc * unroll

    def body(j, c):
        base = j * group
        for u in range(unroll):
            for k in range(k_acc):
                jj = base + u * k_acc + k
                accs[k][pl.ds(idx_ref[jj], 1), :] += vals_ref[pl.ds(jj, 1), :]
        return c

    jax.lax.fori_loop(0, tile // group, body, 0)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        total = accs[0][:]
        for a in accs[1:]:
            total = total + a[:]
        out_ref[:] = total


@functools.partial(jax.jit, static_argnames=("k_acc", "unroll"))
def pallas_scatter(idx, vals, k_acc=4, unroll=2):
    num_tiles = idx.shape[0] // TILE
    return pl.pallas_call(
        functools.partial(_scatter_kernel, tile=TILE, k_acc=k_acc, unroll=unroll),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TILE,), lambda t: (t,), memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((T8, 128), jnp.float32) for _ in range(k_acc)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, vals)


@jax.jit
def xla_row_gather(idx, table):
    return jnp.take(table, idx, axis=0)


def chained(fn, idx, *args, iters=5):
    out = fn(idx, *args)
    np.asarray(out[0, 0])
    start = time.perf_counter()
    for _ in range(iters):
        bump = (out[0, 0] > 1e30).astype(jnp.int32)  # always 0, forces dep
        idx = (idx + bump) % T8
        out = fn(idx, *args)
    np.asarray(out[0, 0])
    return (time.perf_counter() - start) / iters


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T8, jnp.int32)
    table = jnp.ones((T8, 128), jnp.float32)
    vals = jnp.ones((N, 128), jnp.float32)

    dt = chained(xla_row_gather, idx, table)
    print(f"xla_row_gather        : {dt*1e3:8.2f} ms -> {N/dt/1e6:8.1f} M rows/s")

    for unroll in (8, 16):
        fn = functools.partial(pallas_gather, unroll=unroll)
        dt = chained(fn, idx, table)
        print(
            f"pallas_gather u{unroll:<2d}     : {dt*1e3:8.2f} ms -> {N/dt/1e6:8.1f} M rows/s"
        )

    for k_acc, unroll in ((1, 4), (4, 2), (8, 1)):
        fn = functools.partial(pallas_scatter, k_acc=k_acc, unroll=unroll)
        dt = chained(fn, idx, vals)
        print(
            f"pallas_scatter k{k_acc} u{unroll}  : {dt*1e3:8.2f} ms -> {N/dt/1e6:8.1f} M rows/s"
        )


if __name__ == "__main__":
    main()
