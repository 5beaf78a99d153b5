"""Fused NeRF field kernel: positional-encode -> 11-layer MLP in one Pallas call.

The XLA path materializes every hidden activation of the NeRF MLP in HBM
(~0.5 GB per layer per training step at the lego operating point), making
the step memory-bound. This kernel keeps the entire network — weights
(~1.2 MB bf16) and per-tile activations — resident in VMEM and streams only
the inputs (pts, dirs) and outputs (sigma, rgb) through HBM: the
"fully fused MLP" strategy re-done for the TPU MXU.

TPU-specific design points (these dominate performance):

* **Lane-parallel positional encoding.** The naive encode builds 2L+1
  (T, 3) tensors and concatenates — 3/128 lane occupancy and a relayout per
  piece (measured ~3x the cost of the matmuls it feeds). Instead we spread
  the 3 input channels across all encoding columns with one tiny selection
  matmul ``X = pts @ S`` (S is (3, enc_dim)), then apply ``where(id, X,
  where(is_sin, sin(f*X), cos(f*X)))`` on full-width tiles. Identical math,
  full VPU lanes.
* **Aligned concats/slices.** The skip concat becomes ``[h4, pe]`` (256
  first, so every piece starts at a 128-aligned lane) with ``fc_5``'s
  weight rows permuted to match; ``fc_8``'s output columns are permuted to
  ``[features(256), sigma(1)]`` so the feature slice is ``[:, :256]``
  (aligned) instead of ``[:, 1:]`` (a 1-lane rotate of a 257-wide tile).
  Both permutations happen once on the host at flatten time; gradients are
  un-permuted on the way out, so the public layout exactly matches the
  reference (``/root/reference/torch_nerf/src/network/nerf.py:49-119``).

Forward and backward are both Pallas kernels wired up with
``jax.custom_vjp``; the backward rematerializes the forward per tile (no
activation stash in HBM) and accumulates parameter gradients across
sequential grid steps into revisited output blocks. Gradients flow to params
AND to pts/dirs (honest VJP — pose/point optimization keeps working).
Equivalence against the jnp path is asserted in tests/test_pallas.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from torch_nerf_tpu.models.nerf import LAYER_NAMES

Params = Dict[str, Any]

_PRE_SKIP = ("fc_in", "fc_1", "fc_2", "fc_3", "fc_4")
_POST_SKIP = ("fc_5", "fc_6", "fc_7")


@dataclasses.dataclass(frozen=True)
class FusedNeRFConfig:
    coord_encode_level: int = 10
    dir_encode_level: int = 4
    include_input: bool = True
    feat_dim: int = 256
    # 1024 measured fastest on v5e at the lego operating point (74k rays/s
    # vs 69k @ 2048, 68k @ 4096; >= 8192 exceeds the VMEM budget): smaller
    # tiles pipeline input/output DMA with MXU compute across grid steps.
    tile: int = 1024
    # Point budget for the fully-fused TRAIN kernel tile (rays x samples).
    # Larger than ``tile``: the round-5 (S, S) scan masks freed the VMEM the
    # old (T, T) block-diagonal masks consumed. Swept after the poly-trig
    # encode shrank the serial VPU block (scripts/experiments/tile_sweep.py):
    # at 192 samples, 3072 -> 23.64 ms, 4608 -> 22.71, 6144 -> 22.18 (32
    # rays, best), 9216+ fails VMEM-side compile; the 64-sample coarse pass
    # agrees (6144 best).
    train_tile: int = 6144
    compute_dtype: Any = jnp.bfloat16
    interpret: bool = False

    @property
    def pos_enc_dim(self) -> int:
        return 2 * self.coord_encode_level * 3 + (3 if self.include_input else 0)

    @property
    def dir_enc_dim(self) -> int:
        return 2 * self.dir_encode_level * 3 + (3 if self.include_input else 0)


# ---------------------------------------------------------------------------
# lane-parallel positional encoding


@functools.lru_cache(maxsize=None)
def _encode_tables(num_levels: int, include_input: bool, fast_trig: bool = False):
    """Constants for the spread encoding (passed to the kernel as inputs):
    selection matrix S (3, D), per-column frequencies, and float sin/identity
    column masks (cos mask = 1 - sin - id).

    Column layout matches encoders.positional_encoding: [x, y, z,
    sin(2^0 xyz), cos(2^0 xyz), sin(2^1 xyz), ...].

    ``fast_trig`` swaps the (freq, sin_mask) tables for (freq/2pi, quarter)
    used by the fractional-cycle polynomial encode (``_encode_poly``); the
    id_mask column keeps both variants' blend working. fcyc is 0 on identity
    columns (their poly output is masked out, and a zero argument keeps it
    finite); quarter is 0.25 on cos columns (cos x = sin(x + pi/2), i.e. a
    quarter cycle).
    """
    dim = 2 * num_levels * 3 + (3 if include_input else 0)
    sel = np.zeros((3, dim), dtype=np.float32)
    freq = np.zeros((dim,), dtype=np.float32)
    sin_mask = np.zeros((dim,), dtype=np.float32)
    id_mask = np.zeros((dim,), dtype=np.float32)

    col = 0
    if include_input:
        for c in range(3):
            sel[c, col] = 1.0
            freq[col] = 1.0
            id_mask[col] = 1.0
            col += 1
    for level in range(num_levels):
        f = float(2**level)
        for c in range(3):  # sin block
            sel[c, col] = 1.0
            freq[col] = f
            sin_mask[col] = 1.0
            col += 1
        for c in range(3):  # cos block
            sel[c, col] = 1.0
            freq[col] = f
            col += 1
    assert col == dim
    if fast_trig:
        fcyc = freq * (1.0 - id_mask) / (2.0 * np.pi)
        quarter = (1.0 - sin_mask - id_mask) * 0.25
        return sel, fcyc.reshape(1, -1), quarter.reshape(1, -1), id_mask.reshape(1, -1)
    return sel, freq.reshape(1, -1), sin_mask.reshape(1, -1), id_mask.reshape(1, -1)


def _encode_fast(x, tables, dtype):
    """(T, 3) -> ((T, D) encoding in ``dtype``, (T, D) f32 spread).

    ``tables`` = (sel, freq, sin_mask, id_mask) arrays already in VMEM.
    Pure-arithmetic mask blend — no bools, no lane rotations.
    """
    sel, freq, sin_mask, id_mask = tables
    spread = jnp.dot(x, sel, preferred_element_type=jnp.float32)
    y = spread * freq
    cos_mask = 1.0 - sin_mask - id_mask
    enc = id_mask * spread + sin_mask * jnp.sin(y) + cos_mask * jnp.cos(y)
    return enc.astype(dtype), spread


def _encode_fast_bwd(spread, g, tables):
    """VJP of _encode_fast: cotangent (T, D) f32 -> (T, 3) f32."""
    sel, freq, sin_mask, id_mask = tables
    y = spread * freq
    cos_mask = 1.0 - sin_mask - id_mask
    dspread = (
        id_mask * g
        + freq * (sin_mask * jnp.cos(y) - cos_mask * jnp.sin(y)) * g
    )
    return jax.lax.dot_general(
        dspread,
        sel,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# -- fractional-cycle polynomial trig (bf16 compute path only) --------------
#
# The vpu_ablation.py measurement: the sin+cos block is 3.3 ms of the 26 ms
# fused fine pass, and computing ONE transcendental instead of two saves
# almost nothing — XLA's sincos shares its RANGE REDUCTION, which is the
# actual cost. The encoder's frequencies are powers of two, so the reduction
# collapses to fixed-point arithmetic: with v = f*p / 2pi (phase in CYCLES,
# pre-shifted a quarter cycle on cos columns), r = v - round(v) lands in
# [-0.5, 0.5] in two VPU ops, and a degree-9 polynomial evaluates
# sin(2pi r) to 6.3e-6 absolute (cos 4.1e-5) — ~30x below the bf16
# resolution (2^-8 ~ 3.9e-3) the MLP consumes, but far above f32, which is
# why this path is gated on compute_dtype == bfloat16 (the f32/interpret
# path keeps exact sin/cos and its 1e-5-rtol parity tests).
#
# Phase exactness: v carries f32 rounding of ~v * 2^-24 cycles; at the
# highest production frequency (2^9) and |p| <= 8 that is < 4e-5 cycles =
# 2.5e-4 rad of argument error — also below bf16 resolution.
#
# Minimax-fitted on [-0.5, 0.5] (odd/even symmetry; scripts in-tree fit
# these with a weighted-lstsq Remez pass):
_SIN_POLY = (6.28305587, -41.33121848, 81.36688356, -74.4784113, 32.782198)
_COS_POLY = (0.99995982, -19.73104585, 64.67352821, -82.40425879, 45.64814376)


def _use_poly_trig(cfg) -> bool:
    return cfg.compute_dtype == jnp.bfloat16


def _frac_cycle(spread, fcyc, quarter):
    v = spread * fcyc + quarter
    return v - jnp.round(v)


def _poly_odd(r, coeffs):
    r2 = r * r
    acc = jnp.float32(coeffs[-1])
    for c in coeffs[-2::-1]:
        acc = acc * r2 + jnp.float32(c)
    return r * acc


def _poly_even(r, coeffs):
    r2 = r * r
    acc = jnp.float32(coeffs[-1])
    for c in coeffs[-2::-1]:
        acc = acc * r2 + jnp.float32(c)
    return acc


def _encode_poly(x, tables, dtype):
    """(T, 3) -> ((T, D) encoding, (T, D) f32 spread) — poly-trig variant.

    ``tables`` = (sel, fcyc, quarter, id_mask) from
    ``_encode_tables(..., fast_trig=True)``. Matches ``_encode_fast`` to
    well below bf16 resolution at ~1/3 the VPU cost (no range reduction).
    """
    sel, fcyc, quarter, id_mask = tables
    spread = jnp.dot(x, sel, preferred_element_type=jnp.float32)
    s = _poly_odd(_frac_cycle(spread, fcyc, quarter), _SIN_POLY)
    enc = s + id_mask * (spread - s)
    return enc.astype(dtype), spread


def _encode_poly_bwd(spread, g, tables):
    """VJP of _encode_poly: d enc/d spread = id + (1-id) * cos(2pi r) * f
    (f = 2pi * fcyc, the original per-column angular frequency)."""
    sel, fcyc, quarter, id_mask = tables
    r = _frac_cycle(spread, fcyc, quarter)
    dtrig = _poly_even(r, _COS_POLY) * (fcyc * jnp.float32(2.0 * np.pi))
    dspread = (dtrig + id_mask * (1.0 - dtrig)) * g
    return jax.lax.dot_general(
        dspread,
        sel,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------------------
# small matmul helpers


def _mm(a, b, dtype):
    return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(dtype)


def _mm_tn(a, b):
    """a^T @ b contracting the tile axis -> f32 (dW accumulation)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _relu_grad(act, dh, dt):
    """dh masked to act's relu support — ``dh * [act > 0]``.

    bf16 path: the v5e VPU has no bf16 vector compare, and the f32
    upcast + compare + select chain the earlier rounds used here cost
    ~5 us per (6144, 256) tile per layer — the single largest VPU block
    in the backward. ``min(act * 3.4e38, 1)`` computes the exact 0/1 step
    in two bf16 ops: bf16 has no denormals, so any positive activation is
    >= 2^-126 and saturates past 1 (2^-126 * 3.4e38 = 4.0); zero stays
    zero. f32/interpret path keeps the compare (f32 CPU denormals would
    make the product trick inexact).
    """
    if act.dtype == jnp.bfloat16:
        mask = jnp.minimum(act * jnp.asarray(3.389e38, act.dtype), 1.0)
        return (dh * mask).astype(dt)
    return jnp.where(act.astype(jnp.float32) > 0, dh, 0.0).astype(dt)


def _col_sum(dz):
    """(T, C) -> (1, C) f32 column sums via a ones-row MXU matmul.

    ``jnp.sum(dz.astype(f32), axis=0)`` is a cross-SUBLANE VPU reduction
    preceded by a (T, C) dtype conversion — ~2.5 us per 6144x256 tile, paid
    once per layer per tile; the MXU does the same contraction in ~0.1 us."""
    ones = jnp.ones((1, dz.shape[0]), dz.dtype)
    return jnp.dot(ones, dz, preferred_element_type=jnp.float32)


def _mm_nt(a, w, dtype):
    """a @ w^T contracting the output axis (backward dh)."""
    return jax.lax.dot_general(
        a, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dtype)


# ---------------------------------------------------------------------------
# host-side parameter layout (permutations for aligned in-kernel slicing)


def _flatten_params(params: Params, cfg: FusedNeRFConfig):
    """Flat [w0, b0, w1, b1, ...] in kernel layout, cast to compute dtype.

    Kernel layout differs from the public layout in two ways (undone by
    ``_unflatten_grads``):
    * fc_5 weight rows reordered: public input is [pe, h4]; the kernel
      feeds [h4, pe] so the concat is lane-aligned.
    * fc_8 weight/bias columns reordered: public output is [sigma, feat];
      the kernel produces [feat, sigma] so the feature slice is aligned.
    """
    d = cfg.pos_enc_dim
    flat = []
    for name in LAYER_NAMES:
        w = params[name]["w"]
        b = params[name]["b"].reshape(1, -1)
        if name == "fc_5":
            w = jnp.concatenate([w[d:, :], w[:d, :]], axis=0)
        elif name == "fc_8":
            w = jnp.concatenate([w[:, 1:], w[:, :1]], axis=1)
            b = jnp.concatenate([b[:, 1:], b[:, :1]], axis=1)
        flat.append(w.astype(cfg.compute_dtype))
        flat.append(b.astype(cfg.compute_dtype))
    return flat


def _unflatten_grads(flat, cfg: FusedNeRFConfig) -> Params:
    """Invert _flatten_params' permutations on the f32 gradient arrays."""
    fd = cfg.feat_dim
    out = {}
    for i, name in enumerate(LAYER_NAMES):
        w = flat[2 * i]
        b = flat[2 * i + 1].reshape(-1)
        if name == "fc_5":
            w = jnp.concatenate([w[fd:, :], w[:fd, :]], axis=0)
        elif name == "fc_8":
            w = jnp.concatenate([w[:, -1:], w[:, :-1]], axis=1)
            b = jnp.concatenate([b[-1:], b[:-1]], axis=0)
        out[name] = {"w": w, "b": b}
    return out


def _weight_refs_to_tree(refs):
    return {
        name: {"w": refs[2 * i][:], "b": refs[2 * i + 1][:]}
        for i, name in enumerate(LAYER_NAMES)
    }


# ---------------------------------------------------------------------------
# forward


def _forward_tile(
    pts, dirs, w, pos_tables, dir_tables, cfg: FusedNeRFConfig,
    keep_spreads: bool = True,
):
    """Forward math on one (T, ...) tile in kernel layout.

    ``keep_spreads=False`` drops the f32 encode-spread activations (only the
    encode VJP consumes them — the loss-fused train kernel skips input
    grads, and the (T, 90) f32 pair costs ~2.2 MB of VMEM at its tile)."""
    dt = cfg.compute_dtype
    fd = cfg.feat_dim
    encode = _encode_poly if _use_poly_trig(cfg) else _encode_fast
    pe, pe_spread = encode(pts, pos_tables, dt)
    de, de_spread = encode(dirs, dir_tables, dt)

    acts = {"pe": pe, "de": de}
    if keep_spreads:
        acts["pe_spread"] = pe_spread
        acts["de_spread"] = de_spread
    h = pe
    for name in _PRE_SKIP:
        h = jnp.maximum(_mm(h, w[name]["w"], dt) + w[name]["b"], 0.0)
        acts[name] = h
    # the concats are NOT stored as activations: backward rebuilds them from
    # their stored parts (h4/pe, z8/de) — together they would cost ~9 MB of
    # VMEM per 6144-point tile for data that already lives there
    cat5 = jnp.concatenate([h, pe], axis=-1)  # kernel layout: [h4, pe]
    h = cat5
    for name in _POST_SKIP:
        h = jnp.maximum(_mm(h, w[name]["w"], dt) + w[name]["b"], 0.0)
        acts[name] = h
    z8 = _mm(h, w["fc_8"]["w"], dt) + w["fc_8"]["b"]  # kernel layout: [feat, sigma]
    acts["z8"] = z8
    sigma = jnp.maximum(z8[:, fd:].astype(jnp.float32), 0.0)  # (T, 1)
    cat9 = jnp.concatenate([z8[:, :fd], de], axis=-1)
    h9 = jnp.maximum(_mm(cat9, w["fc_9"]["w"], dt) + w["fc_9"]["b"], 0.0)
    acts["fc_9"] = h9
    z_out = _mm(h9, w["fc_out"]["w"], dt) + w["fc_out"]["b"]
    rgb = jax.nn.sigmoid(z_out.astype(jnp.float32))
    acts["rgb"] = rgb
    acts["sigma"] = sigma
    return acts


def _fwd_kernel(cfg: FusedNeRFConfig, pts_ref, dirs_ref, *rest):
    pos_tables = tuple(r[:] for r in rest[:4])
    dir_tables = tuple(r[:] for r in rest[4:8])
    weight_refs = rest[8:-2]
    sigma_ref, rgb_ref = rest[-2:]
    w = _weight_refs_to_tree(weight_refs)
    pts = pts_ref[:].astype(jnp.float32)
    dirs = dirs_ref[:].astype(jnp.float32)
    acts = _forward_tile(pts, dirs, w, pos_tables, dir_tables, cfg)
    sigma_ref[:] = acts["sigma"]
    rgb_ref[:] = acts["rgb"]


# ---------------------------------------------------------------------------
# backward


def _backward_tile(
    w,
    acts,
    g_sigma,
    g_rgb,
    pos_tables,
    dir_tables,
    cfg: FusedNeRFConfig,
    want_input_grads: bool = True,
):
    """Backward math on one tile given forward activations and cotangents.

    Returns ``(grads, dpts, ddirs)`` where ``grads[name] = (dW f32, db f32)``
    in kernel layout; ``dpts``/``ddirs`` are ``None`` when
    ``want_input_grads=False`` (loss-fused training, where sample positions
    are data and carry no parameter gradient — skipping them saves the
    encode-VJP matmuls).
    """
    dt = cfg.compute_dtype
    fd = cfg.feat_dim
    grads = {}

    rgb = acts["rgb"]
    dz_out = (g_rgb * rgb * (1.0 - rgb)).astype(dt)
    grads["fc_out"] = (_mm_tn(acts["fc_9"], dz_out), _col_sum(dz_out))
    dh9 = _mm_nt(dz_out, w["fc_out"]["w"], dt)
    dz9 = _relu_grad(acts["fc_9"], dh9, dt)

    cat9 = jnp.concatenate([acts["z8"][:, :fd], acts["de"]], axis=-1)
    grads["fc_9"] = (_mm_tn(cat9, dz9), _col_sum(dz9))
    dcat9 = _mm_nt(dz9, w["fc_9"]["w"], dt)
    dfeat = dcat9[:, :fd]
    dde = dcat9[:, fd:].astype(jnp.float32)

    # fc_8, kernel layout [feat, sigma]: relu only on the sigma column
    z8 = acts["z8"]
    dsig = jnp.where(z8[:, fd:].astype(jnp.float32) > 0, g_sigma, 0.0).astype(dt)
    dz8 = jnp.concatenate([dfeat, dsig], axis=-1).astype(dt)
    grads["fc_8"] = (_mm_tn(acts["fc_7"], dz8), _col_sum(dz8))
    dh = _mm_nt(dz8, w["fc_8"]["w"], dt)

    cat5 = jnp.concatenate([acts["fc_4"], acts["pe"]], axis=-1)
    post_inputs = {"fc_5": cat5, "fc_6": acts["fc_5"], "fc_7": acts["fc_6"]}
    for name in reversed(_POST_SKIP):
        dz = _relu_grad(acts[name], dh, dt)
        grads[name] = (_mm_tn(post_inputs[name], dz), _col_sum(dz))
        dh = _mm_nt(dz, w[name]["w"], dt)

    # skip split in kernel layout: cat5 = [h4, pe]
    dpe = dh[:, fd:].astype(jnp.float32)
    dh = dh[:, :fd]

    pre_inputs = {
        "fc_in": acts["pe"],
        "fc_1": acts["fc_in"],
        "fc_2": acts["fc_1"],
        "fc_3": acts["fc_2"],
        "fc_4": acts["fc_3"],
    }
    for name in reversed(_PRE_SKIP):
        dz = _relu_grad(acts[name], dh, dt)
        grads[name] = (_mm_tn(pre_inputs[name], dz), _col_sum(dz))
        dh = _mm_nt(dz, w[name]["w"], dt)
    dpe = dpe + dh.astype(jnp.float32)

    if want_input_grads:
        enc_bwd = _encode_poly_bwd if _use_poly_trig(cfg) else _encode_fast_bwd
        dpts = enc_bwd(acts["pe_spread"], dpe, pos_tables)
        ddirs = enc_bwd(acts["de_spread"], dde, dir_tables)
        return grads, dpts, ddirs
    return grads, None, None


def _bwd_kernel(cfg: FusedNeRFConfig, pts_ref, dirs_ref, *rest):
    num_w = 2 * len(LAYER_NAMES)
    pos_tables = tuple(r[:] for r in rest[:4])
    dir_tables = tuple(r[:] for r in rest[4:8])
    rest = rest[8:]
    weight_refs = rest[:num_w]
    g_sigma_ref, g_rgb_ref = rest[num_w : num_w + 2]
    grad_refs = rest[num_w + 2 : num_w + 2 + num_w]
    dpts_ref, ddirs_ref = rest[num_w + 2 + num_w :]

    w = _weight_refs_to_tree(weight_refs)
    pts = pts_ref[:].astype(jnp.float32)
    dirs = dirs_ref[:].astype(jnp.float32)

    acts = _forward_tile(pts, dirs, w, pos_tables, dir_tables, cfg)  # rematerialize

    g_sigma = g_sigma_ref[:].astype(jnp.float32)  # (T, 1)
    g_rgb = g_rgb_ref[:].astype(jnp.float32)  # (T, 3)

    grads, dpts, ddirs = _backward_tile(
        w, acts, g_sigma, g_rgb, pos_tables, dir_tables, cfg
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

    dpts_ref[:] = dpts
    ddirs_ref[:] = ddirs


# ---------------------------------------------------------------------------
# pallas_call plumbing


def _pad_to_tile(x, tile):
    m = x.shape[0]
    padded = -(-m // tile) * tile
    if padded == m:
        return x, m
    return jnp.pad(x, ((0, padded - m), (0, 0))), m


def _compiler_params(cfg: FusedNeRFConfig):
    if cfg.interpret:
        return None
    # v5e/v4 have 128 MiB of physical VMEM; the default 16 MiB scoped limit
    # rejects the grad accumulators + activations at large tiles.
    return pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_nerf_apply(
    params: Params, pts: jnp.ndarray, dirs: jnp.ndarray, cfg: FusedNeRFConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sigma (M,), rgb (M, 3)) for flat points/dirs (M, 3)."""
    return _fused_forward(params, pts, dirs, cfg)


def _table_arrays(cfg: FusedNeRFConfig):
    fast = _use_poly_trig(cfg)
    pos = [
        jnp.asarray(t)
        for t in _encode_tables(cfg.coord_encode_level, cfg.include_input, fast)
    ]
    dirs = [
        jnp.asarray(t)
        for t in _encode_tables(cfg.dir_encode_level, cfg.include_input, fast)
    ]
    return pos + dirs


def _fused_forward(params, pts, dirs, cfg: FusedNeRFConfig):
    flat_w = _flatten_params(params, cfg)
    tables = _table_arrays(cfg)
    pts_p, m = _pad_to_tile(pts, cfg.tile)
    dirs_p, _ = _pad_to_tile(dirs, cfg.tile)
    num_tiles = pts_p.shape[0] // cfg.tile

    tile_spec = pl.BlockSpec((cfg.tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    table_specs = [
        pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for t in tables
    ]
    weight_specs = [
        pl.BlockSpec(wa.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for wa in flat_w
    ]

    sigma, rgb = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg),
        grid=(num_tiles,),
        in_specs=[tile_spec, tile_spec] + table_specs + weight_specs,
        out_specs=[
            pl.BlockSpec((cfg.tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pts_p.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((pts_p.shape[0], 3), jnp.float32),
        ],
        compiler_params=_compiler_params(cfg),
        interpret=cfg.interpret,
    )(pts_p, dirs_p, *tables, *flat_w)
    return sigma[:m, 0], rgb[:m]


def _fused_fwd(params, pts, dirs, cfg):
    out = _fused_forward(params, pts, dirs, cfg)
    return out, (params, pts, dirs)


def _fused_bwd(cfg, residuals, cotangents):
    params, pts, dirs = residuals
    g_sigma, g_rgb = cotangents

    flat_w = _flatten_params(params, cfg)
    tables = _table_arrays(cfg)
    pts_p, m = _pad_to_tile(pts, cfg.tile)
    dirs_p, _ = _pad_to_tile(dirs, cfg.tile)
    g_sigma_p, _ = _pad_to_tile(g_sigma.reshape(-1, 1), cfg.tile)
    g_rgb_p, _ = _pad_to_tile(g_rgb, cfg.tile)
    num_tiles = pts_p.shape[0] // cfg.tile

    tile3 = pl.BlockSpec((cfg.tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tile1 = pl.BlockSpec((cfg.tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    table_specs = [
        pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for t in tables
    ]
    weight_specs = [
        pl.BlockSpec(wa.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for wa in flat_w
    ]
    # revisited accumulator blocks: every grid step maps to block (0, 0)
    grad_specs = [
        pl.BlockSpec(wa.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for wa in flat_w
    ]
    grad_shapes = [jax.ShapeDtypeStruct(wa.shape, jnp.float32) for wa in flat_w]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg),
        grid=(num_tiles,),
        in_specs=[tile3, tile3] + table_specs + weight_specs + [tile1, tile3],
        out_specs=grad_specs + [tile3, tile3],
        out_shape=grad_shapes
        + [
            jax.ShapeDtypeStruct(pts_p.shape, jnp.float32),
            jax.ShapeDtypeStruct(dirs_p.shape, jnp.float32),
        ],
        compiler_params=_compiler_params(cfg),
        interpret=cfg.interpret,
    )(pts_p, dirs_p, *tables, *flat_w, g_sigma_p, g_rgb_p)

    flat_grads = outs[: len(flat_w)]
    dpts = outs[len(flat_w)][:m]
    ddirs = outs[len(flat_w) + 1][:m]
    dparams = _unflatten_grads(flat_grads, cfg)
    return dparams, dpts, ddirs


fused_nerf_apply.defvjp(_fused_fwd, _fused_bwd)
