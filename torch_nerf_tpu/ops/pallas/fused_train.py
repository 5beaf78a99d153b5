"""Fully-fused NeRF training pass: encode -> MLP -> composite -> MSE ->
backward -> parameter gradients, one Pallas kernel per ray tile.

Round-1 profile of the hierarchical train step (54.7 ms at 4096 rays on v5e):
forward kernels 12 ms, backward kernels 28.5 ms (2.4x — the backward
*rematerialized* the whole forward because activations could not cross the
kernel boundary without an HBM round-trip), XLA glue (compositing, loss,
cotangent plumbing) ~14 ms. Fusing the entire per-ray loss pipeline into ONE
kernel removes both costs at once: activations stay in VMEM between the
forward and backward halves (no rematerialization), and the composite + MSE
+ their VJPs run on the same resident tile (no XLA round-trips).

TPU-specific design points:

* **Scans as (S, S) masked matmuls via MXU relayouts.** The quadrature
  integrator needs two per-ray scans over the sample axis: an exclusive
  prefix sum of sigma*delta (transmittance) and a strict suffix sum (the
  dw -> dsigma term). Rounds 1-4 ran each scan as one matmul against a
  (T, T) = (rays*samples)^2 block-diagonal mask to keep the sample stream
  in its point-major (T, 1) layout; at 192 samples those three masks cost
  14 MB of VMEM, capping the tile at 8 rays. Round 5 runs the scans
  ray-major against a single (S, S) triangular mask shared by all rays
  (~64x smaller). The point-major <-> ray-major (T, 1) <-> (R, S)
  relayouts this needs are NOT Mosaic reshapes — the lane->sublane
  direction fails to compile ("unsupported shape cast", see
  scripts/experiments/relayout_probe2.py) — but exact 0/1 masked matmuls:

      to_ray_major(x)  = E^T @ (x * Msel)            -- (R, S)
      to_point_major(X) = rowsum((E @ X) * Msel)     -- (T, 1)

  with E[i, r] = [i // S == r] (the ray-expansion matrix already used to
  broadcast ray data) and Msel[i, s] = [i % S == s]. Each costs one small
  MXU matmul plus one (T, S) elementwise op — ~2 us against a ~100 us
  tile — and only four are needed per tile (sigma*delta in, transmittance
  out, gw*w in, suffix sum out). Freeing the mask VMEM raises the tile
  from 8 to 32 rays at 192 samples.
* **No input gradients.** Sample positions/directions are functions of data
  and RNG only, so the encode VJP and the d(pts)/d(dirs) matmuls of the
  generic backward are skipped entirely.
* **Per-ray decomposable loss.** MSE over rays is a mean of per-ray terms,
  so the cotangent of each ray's color is local: 2*(C - gt)/(N*3) with the
  1/N folded into a per-ray ``lossw`` input (zero for padded rays). Nothing
  about the loss couples tiles, which is what makes full fusion legal.

Math matches the reference exactly:
``/root/reference/torch_nerf/src/renderer/integrators/quadrature_integrator.py:41-65``
(emission-absorption quadrature) and ``runners/train.py:170-216`` (coarse +
fine MSE summed before one backward). The composite VJP is closed-form:

    s_i = sigma_i * delta_i,  T_i = exp(-sum_{j<i} s_j),  a_i = 1 - exp(-s_i)
    w_i = T_i a_i,            C = sum_i w_i c_i
    dL/dc_i     = w_i * g                    (g = per-ray color cotangent)
    dL/ds_i     = (g.c_i) T_i e^{-s_i} - sum_{k>i} (g.c_k) w_k
    dL/dsigma_i = delta_i * dL/ds_i
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torch_nerf_tpu.models.nerf import LAYER_NAMES
from torch_nerf_tpu.ops.pallas.fused_nerf import (
    FusedNeRFConfig,
    _backward_tile,
    _compiler_params,
    _flatten_params,
    _forward_tile,
    _table_arrays,
    _unflatten_grads,
    _weight_refs_to_tree,
)

Params = Dict[str, Any]


def tile_rays(samples: int, max_points: int = 6144) -> int:
    """Rays per kernel tile: a multiple of 8 (the per-ray input blocks are
    (R, 3) sublane tiles, which Mosaic requires 8-aligned) with R*S around
    ``max_points``. At 6144 points the (R*S, ~3.5k-col) bf16 activation set
    is ~45 MB — comfortably inside the 100 MB VMEM window now that the scan
    masks are (S, S)."""
    return max(8, max_points // samples // 8 * 8)


@functools.lru_cache(maxsize=None)
def _sample_masks(samples: int):
    """(S, S) triangular scan masks shared by every ray in the tile.

    ``excl[i, j]`` = [j < i] (exclusive prefix sum — transmittance).
    ``suf[i, j]``  = [j > i] (strict suffix sum — the dw -> dsigma term).
    """
    i = np.arange(samples)
    excl = (i[None, :] < i[:, None]).astype(np.float32)
    suf = (i[None, :] > i[:, None]).astype(np.float32)
    return excl, suf


@functools.lru_cache(maxsize=None)
def _expand_matrix(num_rays: int, samples: int):
    """(T, R) 0/1 matrix: E[i, r] = [i // samples == r]. One MXU matmul
    broadcasts per-ray rows (origins, directions) to their samples, so the
    host never materializes lane-sparse (N, S, 3) streams."""
    i = np.arange(num_rays * samples)
    return (i[:, None] // samples == np.arange(num_rays)[None, :]).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _lane_select_matrix(num_rays: int, samples: int):
    """(T, S) 0/1 matrix: Msel[i, s] = [i % samples == s] — the lane-
    placement half of the masked-matmul relayouts (module docstring)."""
    i = np.arange(num_rays * samples)
    return (i[:, None] % samples == np.arange(samples)[None, :]).astype(np.float32)


def _to_ray_major(x, expand, msel):
    """Exact (T, 1) -> (R, S) relayout: E^T @ (x * Msel). The product
    places row i's value in lane i%S; the contraction sums one nonzero per
    output element, so f32 bits are preserved."""
    return jax.lax.dot_general(
        expand,
        x * msel,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _to_point_major(x_rs, expand, msel):
    """Exact (R, S) -> (T, 1) relayout: rowsum((E @ X) * Msel)."""
    spread = jnp.dot(expand, x_rs, preferred_element_type=jnp.float32)
    return jnp.sum(spread * msel, axis=1, keepdims=True)


def _composite_tile(sigma, rgb, delta_rs, gt, lossw, excl, suf, expand, msel, scan_dtype):
    """Forward composite + per-ray MSE cotangents on one tile.

    The MLP's sigma/rgb are point-major (T, 1)/(T, 3); intervals arrive
    RAY-MAJOR (R, S) — the dense-lane layout the host streams (a (T, 1)
    column tiles to one element per 128-lane VMEM row: 128x padded DMA
    windows, measured ~35 us/tile of unoverlapped latency). The
    transmittance chain runs ray-major (dense-lane VPU), the two per-ray
    scans are one MXU matmul each against an (S, S) triangular mask shared
    across rays, and five exact masked-matmul relayouts (module docstring)
    hop between the layouts. Scan operands feed the MXU in ``scan_dtype``
    (bf16 runs 8x f32 rate on v5e; accumulation stays f32 via
    ``preferred_element_type`` — the 0/1 mask is exact in bf16, only the
    per-sample summand rounds).

    Math (reference ``quadrature_integrator.py:41-65``):
        s_i = sigma_i delta_i, T_i = exp(-sum_{j<i} s_j), a_i = 1 - e^{-s_i}
        w_i = T_i a_i,  C = sum_i w_i c_i
        dL/dc_i = w_i g,  dL/dsigma_i = delta_i ((g.c_i) T_i e^{-s_i}
                                        - sum_{k>i} (g.c_k) w_k)

    ``gt``/``lossw`` stay per-ray (R, .). Returns ``(c_ray (R, 3),
    w_rs (R, S), g_sigma (T, 1), g_rgb (T, 3))``.
    """

    def scan(mask, x_rs):
        # out[r, i] = sum_j mask[i, j] x_rs[r, j]
        return jax.lax.dot_general(
            x_rs.astype(scan_dtype),
            mask,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    sd_rs = _to_ray_major(sigma, expand, msel) * delta_rs  # (R, S)
    trans_rs = jnp.exp(-scan(excl, sd_rs))
    att_rs = jnp.exp(-sd_rs)
    w_rs = trans_rs * (1.0 - att_rs)  # (R, S)
    w = _to_point_major(w_rs, expand, msel)  # (T, 1)

    wc = w * rgb  # (T, 3)
    c_ray = jax.lax.dot_general(  # per-ray color: sum of the ray's wc rows
        expand, wc, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (R, 3)

    g = (c_ray - gt) * lossw  # (R, 3) per-ray color cotangent
    g_pm = jnp.dot(expand, g, preferred_element_type=jnp.float32)  # (T, 3)
    g_rgb = w * g_pm  # (T, 3) dL/dc_i = w_i g
    gw = jnp.sum(rgb * g_pm, axis=-1, keepdims=True)  # (T, 1) dL/dw_i
    gw_rs = _to_ray_major(gw, expand, msel)  # (R, S)
    sfx_rs = scan(suf, gw_rs * w_rs)
    gs_rs = gw_rs * trans_rs * att_rs - sfx_rs
    g_sigma = _to_point_major(delta_rs * gs_rs, expand, msel)  # (T, 1)
    return c_ray, w_rs, g_sigma, g_rgb


def _train_kernel(cfg: FusedNeRFConfig, t_ref, delta_ref, raydata_ref, *rest):
    num_w = 2 * len(LAYER_NAMES)
    excl_ref, suf_ref, expand_ref, msel_ref = rest[:4]
    pos_tables = tuple(r[:] for r in rest[4:8])
    dir_tables = tuple(r[:] for r in rest[8:12])
    weight_refs = rest[12 : 12 + num_w]
    rgb_ref, w_out_ref = rest[12 + num_w : 14 + num_w]
    grad_refs = rest[14 + num_w :]

    w = _weight_refs_to_tree(weight_refs)
    raydata = raydata_ref[:]  # (R, 10) = [o | d | gt | lossw]
    expand = expand_ref[:]
    msel = msel_ref[:]

    # broadcast the per-ray origin/direction rows to their samples with ONE
    # tiny f32 MXU matmul (0/1 selection — exact): the host streams only
    # dense-lane (R, S) depth/interval planes and (R, 10) ray rows — a
    # lane-sparse (N, S, 3) tensor never exists, and neither does a (T, 1)
    # column in HBM (whose VMEM window would pad 128x).
    rd = jnp.dot(expand, raydata, preferred_element_type=jnp.float32)
    ray_o, dirs = rd[:, 0:3], rd[:, 3:6]
    gt, lossw = raydata[:, 6:9], raydata[:, 9:10]  # stay per-ray (R, .)

    t = _to_point_major(t_ref[:].astype(jnp.float32), expand, msel)  # (T, 1)
    pts = ray_o + t * dirs

    acts = _forward_tile(
        pts, dirs, w, pos_tables, dir_tables, cfg, keep_spreads=False
    )

    c_ray, w_rs, g_sigma, g_rgb = _composite_tile(
        acts["sigma"],
        acts["rgb"],
        delta_ref[:].astype(jnp.float32),
        gt,
        lossw,
        excl_ref[:],
        suf_ref[:],
        expand,
        msel,
        cfg.compute_dtype,
    )
    rgb_ref[:] = c_ray
    w_out_ref[:] = w_rs

    grads, _, _ = _backward_tile(
        w, acts, g_sigma, g_rgb, pos_tables, dir_tables, cfg,
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


def fused_train_pass(
    params: Params,
    ray_o: jnp.ndarray,
    ray_d: jnp.ndarray,
    t_samples: jnp.ndarray,
    delta: jnp.ndarray,
    rgb_gt: jnp.ndarray,
    cfg: FusedNeRFConfig,
    num_real_rays: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, Params]:
    """One render pass with its loss gradient, fully fused.

    Args:
        params: NeRF MLP params (public layout).
        ray_o: (N, 3) ray origins.
        ray_d: (N, 3) ray directions.
        t_samples: (N, S) sample depths along each ray (ray-major).
        delta: (N, S) quadrature interval lengths.
        rgb_gt: (N, 3) ground-truth pixel colors.
        cfg: the fused-kernel config (shared with ``fused_nerf_apply``).
        num_real_rays: rays that actually contribute to the mean (rays padded
            up to the tile multiple carry zero loss weight).

    Returns:
        ``(rgb (N, 3), weights (N, S), grads)`` where ``grads`` is the
        gradient of ``mean((rgb - rgb_gt)**2)`` over the first
        ``num_real_rays`` rays w.r.t. ``params`` (public layout). ``rgb`` and
        ``weights`` match ``renderer._render_pass`` exactly.

    Sample positions ``o + t*d`` and the per-ray -> per-sample broadcasts
    happen INSIDE the kernel (one expansion matmul): the host streams only
    dense-lane (N, S) depth/interval planes and (N, .) per-ray rows. The
    lane-sparse (N, S, 3) points/directions tensors of the generic path
    never exist (each cost ~1.2 ms/step of pure relayout HBM traffic at the
    4096x192 operating point), and neither do (N*S, 1) columns (whose VMEM
    windows pad to one element per 128-lane row — 128x the DMA bytes).
    """
    num_rays, samples = t_samples.shape
    r_tile = tile_rays(samples, max_points=cfg.train_tile)
    padded_rays = -(-num_rays // r_tile) * r_tile

    def pad(x):
        return jnp.pad(x, ((0, padded_rays - num_rays),) + ((0, 0),) * (x.ndim - 1))

    t_p = pad(t_samples)  # (R_pad, S) — dense-lane ray-major streams
    delta_p = pad(delta)
    lossw = jnp.where(
        jnp.arange(padded_rays)[:, None] < num_real_rays,
        2.0 / (num_real_rays * 3.0),
        0.0,
    ).astype(jnp.float32)
    raydata_p = jnp.concatenate(
        [pad(ray_o), pad(ray_d), pad(rgb_gt), lossw], axis=-1
    )  # (R_pad, 10)

    excl, suf = _sample_masks(samples)
    # ALL masks are 0/1 and therefore exact in bf16; the relayout products
    # (f32 data x bf16 mask) promote to f32, so f32 bits still round-trip.
    # Storing them in the compute dtype halves their VMEM footprint.
    masks = [
        jnp.asarray(m, dtype=cfg.compute_dtype)
        for m in (
            excl,
            suf,
            _expand_matrix(r_tile, samples),
            _lane_select_matrix(r_tile, samples),
        )
    ]
    tables = _table_arrays(cfg)
    flat_w = _flatten_params(params, cfg)
    num_tiles = padded_rays // r_tile

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

    outs = pl.pallas_call(
        functools.partial(_train_kernel, cfg),
        grid=(num_tiles,),
        in_specs=[ray_strm(samples), ray_strm(samples), ray_strm(10)] + const_specs,
        out_specs=[ray_strm(3), ray_strm(samples)] + grad_specs,
        out_shape=[
            jax.ShapeDtypeStruct((padded_rays, 3), jnp.float32),
            jax.ShapeDtypeStruct((padded_rays, samples), jnp.float32),
        ]
        + [jax.ShapeDtypeStruct(wa.shape, jnp.float32) for wa in flat_w],
        compiler_params=_compiler_params(cfg),
        interpret=cfg.interpret,
    )(t_p, delta_p, raydata_p, *masks, *tables, *flat_w)

    rgb = outs[0][:num_rays]
    weights = outs[1][:num_rays]
    grads = _unflatten_grads(outs[2:], cfg)
    return rgb, weights, grads
