"""Ablate the fused train kernel: where do the non-MXU microseconds sit?

Round-5 findings this script produced (4096 rays x 192 samples):
* "fwd_only" (outputs decoupled from the MLP, which DCEs away) isolates the
  pure streaming baseline: 4.5 ms/pass = ~35 us/tile of unoverlapped block
  DMA — traced to (T, 1) column streams whose VMEM windows pad to one
  element per 128-lane row (128x the DMA bytes). Fixed by streaming
  dense-lane (R, S) planes; the step went 115k -> 120k rays/s.
* "full" - "mlp_only" = 1.0 ms: the composite + masked-matmul relayouts are
  ~4% of the pass — NOT the bound.
* "mlp_only" - baseline = 21.3 ms for the MLP fwd+bwd vs ~16.4 ms of
  padding-aware MXU time: the fused MLP block runs at ~77% internal MXU
  efficiency; with the ~86% K/N-padding ceiling (63/319/257/283-wide layers
  pad to 128) this explains the ~0.55 whole-step MFU.

Sequels: vpu_ablation.py isolated the sin/cos block inside the ~5 ms gap
(3.28 ms — XLA's shared range reduction) and drove the poly-trig encode;
tile_sweep.py re-swept the tile after it (24 -> 32 rays). Together:
120k -> 138k rays/s.

Run on the real TPU: python scripts/experiments/fused_train_ablation.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torch_nerf_tpu.fields import make_nerf_field
from torch_nerf_tpu.models.nerf import LAYER_NAMES
from torch_nerf_tpu.ops.pallas import fused_nerf as fn
from torch_nerf_tpu.ops.pallas import fused_train as ft
from torch_nerf_tpu.ops.pallas.fused_nerf import _backward_tile, _compiler_params

N, S = 4096, 192
field = make_nerf_field(compute_dtype=jnp.bfloat16, use_pallas=True)
CFG = field.fused_cfg
params = field.init(jax.random.PRNGKey(0))

rng = np.random.default_rng(0)
ray_o = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
ray_d = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32))
rgb_gt = jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32))
t = jnp.sort(jnp.asarray(rng.uniform(2, 6, size=(N, S)).astype(np.float32)), axis=1)
delta = jnp.concatenate([t[:, 1:] - t[:, :-1], jnp.full((N, 1), 1e8)], axis=1)


def timeit(f, args, iters=30):
    """Times a CHAIN of calls: iteration i+1's depth column carries a
    device-side data dependency on iteration i's output (+grad*1e-30 — a
    subnormal increment that rounds away, so values stay bit-identical but
    XLA cannot fold the edge). Through the remote-TPU tunnel, independent
    same-arg dispatches are enqueue-only under block_until_ready and
    fresh-arg dispatches pay ~120 ms of host<->device transfer; the chain
    keeps everything device-resident and serialized, matching bench.py's
    state-threading methodology (validated: the chained full-variant time
    matches the production fused pass timed through the train step)."""

    @jax.jit
    def chained(t_cur, rest):
        out = f(t_cur, *rest)
        # out[2] is the first weight-grad accumulator: depend on it
        bump = out[2][0:1, 0:1] * jnp.float32(1e-30)
        return t_cur + bump, out

    rest = args[1:]
    t_cur, out = chained(args[0], rest)
    _ = float(np.asarray(t_cur[0, 0]))  # value fetch: the only reliable sync
    t0 = time.perf_counter()
    for _ in range(iters):
        t_cur, out = chained(t_cur, rest)
    _ = float(np.asarray(t_cur[0, 0]))
    return (time.perf_counter() - t0) / iters * 1e3


def make_variant(mode):
    """A pallas_call mirroring fused_train_pass with stages cut out.

    mode: "full" | "no_composite" (constant cotangents, scans skipped) |
    "fwd_only" (no backward MLP / grad outputs) | "mlp_only" (fwd+bwd,
    composite replaced by constants) — identical streaming/tile structure.
    """
    num_rays, samples = N, S
    r_tile = ft.tile_rays(samples, max_points=CFG.train_tile)
    padded = -(-num_rays // r_tile) * r_tile
    tt = r_tile * samples
    num_w = 2 * len(LAYER_NAMES)

    def kernel(t_ref, delta_ref, raydata_ref, *rest):
        excl_ref, suf_ref, expand_ref, msel_ref = rest[:4]
        pos_tables = tuple(r[:] for r in rest[4:8])
        dir_tables = tuple(r[:] for r in rest[8:12])
        weight_refs = rest[12 : 12 + num_w]
        rgb_ref, w_out_ref = rest[12 + num_w : 14 + num_w]
        grad_refs = rest[14 + num_w :]
        w = fn._weight_refs_to_tree(weight_refs)
        raydata = raydata_ref[:]
        expand = expand_ref[:]
        rd = jnp.dot(expand, raydata, preferred_element_type=jnp.float32)
        ray_o_k, dirs = rd[:, 0:3], rd[:, 3:6]
        gt, lossw = raydata[:, 6:9], raydata[:, 9:10]
        tcol = ft._to_point_major(
            t_ref[:].astype(jnp.float32), expand, msel_ref[:]
        )
        pts = ray_o_k + tcol * dirs
        acts = fn._forward_tile(
            pts, dirs, w, pos_tables, dir_tables, CFG, keep_spreads=False
        )
        if mode in ("full",):
            c_ray, weights, g_sigma, g_rgb = ft._composite_tile(
                acts["sigma"], acts["rgb"], delta_ref[:].astype(jnp.float32),
                gt, lossw, excl_ref[:], suf_ref[:], expand, msel_ref[:],
                CFG.compute_dtype,
            )
        else:
            c_ray = gt
            weights = delta_ref[:] * 1e-9
            g_sigma = acts["sigma"] * 1e-3
            g_rgb = acts["rgb"] * 1e-3
        rgb_ref[:] = c_ray
        w_out_ref[:] = weights
        if mode == "fwd_only":
            for i in range(num_w):
                @pl.when(pl.program_id(0) == 0)
                def _(i=i):
                    grad_refs[i][:] = jnp.zeros_like(grad_refs[i])
            return
        grads, _, _ = _backward_tile(
            w, acts, g_sigma, g_rgb, pos_tables, dir_tables, CFG,
            want_input_grads=False,
        )
        is_first = pl.program_id(0) == 0
        for i, name in enumerate(LAYER_NAMES):
            dw, db = grads[name]
            db = db.reshape(1, -1)

            @pl.when(is_first)
            def _(i=i, dw=dw, db=db):
                grad_refs[2 * i][:] = dw
                grad_refs[2 * i + 1][:] = db

            @pl.when(jnp.logical_not(is_first))
            def _(i=i, dw=dw, db=db):
                grad_refs[2 * i][:] += dw
                grad_refs[2 * i + 1][:] += db

    def pad(x):
        return jnp.pad(x, ((0, padded - num_rays),) + ((0, 0),) * (x.ndim - 1))

    t_p = pad(t)  # (R_pad, S) dense-lane streams, as the production kernel
    delta_p = pad(delta)
    lossw = jnp.full((padded, 1), 2.0 / (num_rays * 3.0), jnp.float32)
    raydata_p = jnp.concatenate([pad(ray_o), pad(ray_d), pad(rgb_gt), lossw], -1)
    excl, suf = ft._sample_masks(samples)
    masks = [
        jnp.asarray(m, dtype=CFG.compute_dtype)
        for m in (excl, suf, ft._expand_matrix(r_tile, samples),
                  ft._lane_select_matrix(r_tile, samples))
    ]
    tables = fn._table_arrays(CFG)
    flat_w = fn._flatten_params(params, CFG)
    num_tiles = padded // r_tile

    def strm(k):
        return pl.BlockSpec((tt, k), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def ray_strm(k):
        return pl.BlockSpec((r_tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM)

    const_specs = [
        pl.BlockSpec(a.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for a in masks + tables + flat_w
    ]
    grad_specs = [
        pl.BlockSpec(wa.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for wa in flat_w
    ]
    call = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[ray_strm(samples), ray_strm(samples), ray_strm(10)] + const_specs,
        out_specs=[ray_strm(3), ray_strm(samples)] + grad_specs,
        out_shape=[
            jax.ShapeDtypeStruct((padded, 3), jnp.float32),
            jax.ShapeDtypeStruct((padded, samples), jnp.float32),
        ]
        + [jax.ShapeDtypeStruct(wa.shape, jnp.float32) for wa in flat_w],
        compiler_params=_compiler_params(CFG),
    )
    args = (t_p, delta_p, raydata_p, *masks, *tables, *flat_w)
    return jax.jit(call), args


def main():
    mlp_fwd_macs = 593408  # true per-point MACs, fwd
    points = N * S
    flops = {
        "full": 3 * 2 * mlp_fwd_macs * points,
        "mlp_only": 3 * 2 * mlp_fwd_macs * points,
        "no_composite": 3 * 2 * mlp_fwd_macs * points,
        "fwd_only": 2 * mlp_fwd_macs * points,
    }
    peak = 197e12
    results = {}
    for mode in ("fwd_only", "mlp_only", "full"):
        f, args = make_variant(mode)
        ms = timeit(f, args)
        results[mode] = ms
        print(
            f"{mode:14s}: {ms:7.2f} ms  "
            f"({flops[mode] / (ms * 1e-3) / peak * 100:5.1f}% of bf16 peak)",
            flush=True,
        )
    print(
        f"composite+relayouts = full - mlp_only = "
        f"{results['full'] - results['mlp_only']:.2f} ms"
    )
    print(
        f"backward = mlp_only - fwd_only = "
        f"{results['mlp_only'] - results['fwd_only']:.2f} ms "
        f"(FLOP ratio predicts {2 * results['fwd_only']:.2f} ms)"
    )


if __name__ == "__main__":
    main()
