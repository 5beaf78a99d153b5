"""Probe: rate of in-kernel jnp.take_along_axis (tpu.dynamic_gather).

Mosaic only lowers SAME-SHAPE 2D take_along_axis: out[i,j] = table[idx[i,j], j]
(dim 0) — table, idx, out all (T, 128). If this runs at VPU-ish rate for large
T, a hash-table row gather can be vectorized as batches of T point-rows with
lane-broadcast indices. Run on the real TPU:

    python scripts/experiments/probe_dynamic_gather.py

MEASURED (round 3, v5e, jax 0.8.x): tpu.dynamic_gather along dim 0 requires
the SOURCE to be a single vreg along the gather dimension — (T, 128) f32
sources with T > 8 fail to lower ("Not implemented: Multiple source vregs
along gather dimension"). An 8-sublane window is useless for 2^16-row hash
tables, so vectorized VMEM gather is NOT available on this stack; the
per-row scalar dynamic-slice loop (~6 cycles/row) remains the gather
mechanism, and row-count reduction (voxel packing, fewer/wider levels —
models/instant_ngp.py) is the only large lever.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_dg(t_depth: int, reps: int):
    """Kernel doing `reps` chained same-shape gathers to amortize call cost."""

    def kernel(idx_ref, table_ref, out_ref):
        acc = table_ref[:]
        for _ in range(reps):
            acc = jnp.take_along_axis(acc, idx_ref[:], axis=0)
        out_ref[:] = acc

    @jax.jit
    def run(idx, table):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((t_depth, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(idx, table)

    return run


def main():
    key = jax.random.PRNGKey(0)
    reps = 16
    for t_depth in (8, 512, 8192):
        try:
            table = jnp.ones((t_depth, 128), jnp.float32)
            idx = jax.random.randint(key, (t_depth, 128), 0, t_depth, jnp.int32)
            run = make_dg(t_depth, reps)
            out = run(idx, table)
            np.asarray(out[0, 0])
            iters = 8
            start = time.perf_counter()
            for _ in range(iters):
                idx = (idx + out[:1, :1].astype(jnp.int32)) % t_depth
                out = run(idx, table)
            np.asarray(out[0, 0])
            dt = (time.perf_counter() - start) / iters
            rate = t_depth * 128 * reps / dt
            print(
                f"T={t_depth:6d}: OK  {dt*1e3:8.3f} ms/call ({reps} reps) "
                f"-> {rate/1e6:10.1f} M element-gathers/s "
                f"({rate/128/1e6:8.1f} M row-equiv/s)"
            )
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:140]
            print(f"T={t_depth:6d}: FAIL {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
