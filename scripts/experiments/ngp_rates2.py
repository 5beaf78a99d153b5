"""Round-3 microbenchmarks: push the Pallas per-row gather/scatter floors.

The round-2 production kernels run at ~240M gathered rows/s (fwd) and
~254M RMW rows/s (bwd) on this chip — ~6.2 cycles/row at the v5e's ~1.5 GHz.
The step profile shows the two kernels ARE the step (70 + 66 of 153 ms), so
every cycle shaved per row is ~11 ms/step at the reference operating point
(33.6M rows/step). Variants probed here:

  gather:
    g_u{8,16,32}       unroll depth sweep (round-2 ships u16)
    g_2ref_u16         alternate writes between TWO scratch refs (break any
                       store-port / rotation-dependency serialization)
    g_pairs_u16        two independent loop counters walking disjoint halves
                       (more independent address chains in flight)
  scatter (read-modify-write accumulate):
    s_k{4,8}_u{2,4}    accumulator-interleave x unroll sweep (ships k4 u4-ish)
    s_splitidx         idx stream pre-split per accumulator group in XLA so
                       the kernel skips the level-interleave address math

Run on the real TPU:  python scripts/experiments/ngp_rates2.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T8 = 8192
N = 1 << 21
TILE = 8192
VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# --------------------------------------------------------------------- gather
def _g_kernel(idx_ref, table_ref, out_ref, *, unroll):
    def body(j, c):
        base = j * unroll
        for k in range(unroll):
            jj = base + k
            out_ref[pl.ds(jj, 1), :] = table_ref[pl.ds(idx_ref[jj], 1), :]
        return c

    jax.lax.fori_loop(0, TILE // unroll, body, 0)


def _g_2ref_kernel(idx_ref, table_ref, out_ref, s_ref, *, unroll):
    half = TILE // 2

    def body(j, c):
        base = j * unroll
        for k in range(unroll):
            jj = base + k
            dst = out_ref if k % 2 == 0 else s_ref
            dst[pl.ds(jj, 1), :] = table_ref[pl.ds(idx_ref[jj], 1), :]
        return c

    jax.lax.fori_loop(0, TILE // unroll, body, 0)
    out_ref[pl.ds(half, half), :] = s_ref[pl.ds(half, half), :]


def _g_pairs_kernel(idx_ref, table_ref, out_ref, *, unroll):
    half = TILE // 2

    def body(j, c):
        base = j * unroll
        for k in range(unroll):
            jj = base + k
            out_ref[pl.ds(jj, 1), :] = table_ref[pl.ds(idx_ref[jj], 1), :]
            out_ref[pl.ds(half + jj, 1), :] = table_ref[
                pl.ds(idx_ref[half + jj], 1), :
            ]
        return c

    jax.lax.fori_loop(0, half // unroll, body, 0)


def make_gather(kernel, scratch=False, **kw):
    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            functools.partial(kernel, **kw),
            grid=(idx.shape[0] // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda t: (t,), memory_space=pltpu.SMEM),
                pl.BlockSpec((T8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE, 128), lambda t: (t, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((idx.shape[0], 128), jnp.float32),
            scratch_shapes=(
                [pltpu.VMEM((TILE, 128), jnp.float32)] if scratch else []
            ),
            compiler_params=VMEM_LIMIT,
        )(idx, table)

    return run


# -------------------------------------------------------------------- scatter
def _s_kernel(idx_ref, vals_ref, out_ref, *accs, k_acc, unroll):
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

    jax.lax.fori_loop(0, TILE // group, body, 0)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        total = accs[0][:]
        for a in accs[1:]:
            total = total + a[:]
        out_ref[:] = total


def make_scatter(k_acc, unroll):
    @jax.jit
    def run(idx, vals):
        return pl.pallas_call(
            functools.partial(_s_kernel, k_acc=k_acc, unroll=unroll),
            grid=(idx.shape[0] // TILE,),
            in_specs=[
                pl.BlockSpec((TILE,), lambda t: (t,), memory_space=pltpu.SMEM),
                pl.BlockSpec((TILE, 128), lambda t: (t, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T8, 128), lambda t: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T8, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((T8, 128), jnp.float32) for _ in range(k_acc)],
            compiler_params=VMEM_LIMIT,
        )(idx, vals)

    return run


def chained(fn, idx, *args, iters=5):
    out = fn(idx, *args)
    np.asarray(out[0, 0])
    start = time.perf_counter()
    for _ in range(iters):
        bump = (out[0, 0] > 1e30).astype(jnp.int32)
        idx = (idx + bump) % T8
        out = fn(idx, *args)
    np.asarray(out[0, 0])
    return (time.perf_counter() - start) / iters


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (N,), 0, T8, jnp.int32)
    table = jnp.ones((T8, 128), jnp.float32)
    vals = jnp.ones((N, 128), jnp.float32)

    runs = []
    for unroll in (8, 16, 32):
        runs.append((f"g_u{unroll}", make_gather(_g_kernel, unroll=unroll), table))
    runs.append(("g_2ref_u16", make_gather(_g_2ref_kernel, scratch=True, unroll=16), table))
    runs.append(("g_pairs_u16", make_gather(_g_pairs_kernel, unroll=16), table))
    for name, fn, arg in runs:
        dt = chained(fn, idx, arg)
        print(f"{name:16s}: {dt*1e3:8.2f} ms -> {N/dt/1e6:8.1f} M rows/s")

    for k_acc, unroll in ((4, 2), (4, 4), (8, 2), (8, 4)):
        fn = make_scatter(k_acc, unroll)
        dt = chained(fn, idx, vals)
        print(f"s_k{k_acc}_u{unroll:<10d}: {dt*1e3:8.2f} ms -> {N/dt/1e6:8.1f} M rows/s")


if __name__ == "__main__":
    main()
