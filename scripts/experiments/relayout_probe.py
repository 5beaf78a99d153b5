"""Probe: cost of (T,1) <-> (R,S) reshapes inside a Pallas TPU kernel.

The flagship fused train kernel (ops/pallas/fused_train.py) keeps the sample
stream lane-dense (T,1) and pays (T,T) scan masks for it. Moving the
composite to ray-major (R,S) planes shrinks the masks to (S,S) but needs a
sublane<->lane relayout at the MLP boundary. This measures whether Mosaic
compiles that reshape and what it costs at the production tile shapes.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_reshape(r, s, x_ref, o_ref):
    t = r * s
    x = x_ref[:]  # (T, 1)
    x_rs = x.reshape(r, s)          # point-major -> ray-major
    y = x_rs * 2.0
    o_ref[:] = y.reshape(t, 1)      # and back


def _kernel_noop(r, s, x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


def run(r=32, s=192, iters=200, kernel=_kernel_reshape):
    t = r * s
    x = jnp.arange(t, dtype=jnp.float32).reshape(t, 1)
    f = pl.pallas_call(
        functools.partial(kernel, r, s),
        grid=(64,),
        in_specs=[pl.BlockSpec((t, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, 1), jnp.float32),
    )
    f = jax.jit(f)
    out = f(x)
    expect = x * 2.0
    ok = bool(jnp.allclose(out, expect))
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - start) / iters / 64  # per grid step
    return ok, dt


if __name__ == "__main__":
    for r, s in [(8, 192), (32, 192), (64, 192), (96, 64)]:
        try:
            ok, dt = run(r, s, kernel=_kernel_reshape)
            _, dt0 = run(r, s, kernel=_kernel_noop)
            print(
                f"R={r:3d} S={s:3d}: reshape ok={ok} "
                f"{dt*1e6:8.2f} us/tile (noop {dt0*1e6:6.2f} us)"
            )
        except Exception as e:  # noqa: BLE001
            print(f"R={r:3d} S={s:3d}: FAILED: {type(e).__name__}: {str(e)[:300]}")
