"""Probe 2: which (T,1) <-> (R,S) relayout formulations Mosaic accepts.

relayout_probe.py's round trip compiled only because the two reshapes
cancelled; the standalone (R,S)->(T,1) cast fails with "unsupported shape
cast". This enumerates candidate formulations for each direction so the
fused train kernel can pick supported ones.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, S = 32, 192
T = R * S


def k_fwd_reshape(x_ref, o_ref):
    # (T,1) -> (R,S) direct
    o_ref[:] = x_ref[:].reshape(R, S) * 2.0


def k_fwd_via_1d(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(T).reshape(R, S) * 2.0


def k_bwd_reshape(x_ref, o_ref):
    # (R,S) -> (T,1) direct
    o_ref[:] = x_ref[:].reshape(T, 1) * 2.0


def k_bwd_via_1d(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(T).reshape(T, 1) * 2.0


def k_bwd_via_3d(x_ref, o_ref):
    # (R,S) -> (R,S,1) -> (T,1): the minor-2D tiles of (R,S,1) match (T,1)
    o_ref[:] = x_ref[:].reshape(R, S, 1).reshape(T, 1) * 2.0


def k_fwd_via_3d(x_ref, o_ref):
    o_ref[:] = x_ref[:].reshape(R, S, 1).reshape(R, S) * 2.0


def run(name, kernel, in_shape, out_shape, iters=100):
    x = jnp.arange(T, dtype=jnp.float32).reshape(in_shape)
    f = jax.jit(
        pl.pallas_call(
            kernel,
            grid=(32,),
            in_specs=[
                pl.BlockSpec(in_shape, lambda i: (0,) * len(in_shape),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec(out_shape, lambda i: (0,) * len(out_shape),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )
    )
    try:
        out = f(x)
        ok = bool(
            jnp.allclose(np.asarray(out).reshape(-1), np.arange(T) * 2.0)
        )
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(x)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters / 32
        print(f"{name:16s}: ok={ok} order_ok={ok} {dt*1e6:7.2f} us/tile")
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:120]
        print(f"{name:16s}: FAIL {type(e).__name__}: {msg}")


if __name__ == "__main__":
    run("fwd_reshape", k_fwd_reshape, (T, 1), (R, S))
    run("fwd_via_1d", k_fwd_via_1d, (T, 1), (R, S))
    run("fwd_via_3d", k_fwd_via_3d, (T, 1), (R, S))
    run("bwd_reshape", k_bwd_reshape, (R, S), (T, 1))
    run("bwd_via_1d", k_bwd_via_1d, (R, S), (T, 1))
    run("bwd_via_3d", k_bwd_via_3d, (R, S), (T, 1))
