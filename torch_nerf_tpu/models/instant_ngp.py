"""Instant-NGP: multiresolution hash encoding + two small MLPs (JAX).

Behavioral re-implementation of the reference
(``/root/reference/torch_nerf/src/network/instant_ngp.py:11-570``),
vectorized TPU-first: instead of a Python loop over 16 levels with 8
separate corner tensors, all levels and corners evaluate in one batched
gather — shapes (L, N, 8, F) — which XLA lowers to a single fused gather per
level group.

Reference quirks preserved deliberately (documented for parity):

* corners come from ``floor``/``ceil`` (NOT ``floor``/``floor+1``): when a
  scaled coordinate is exactly integral the trilinear weights all vanish and
  the feature is zero (``instant_ngp.py:442-475``);
* the density head applies ``2 ** x`` with NO ReLU (the reference defines
  ``density_actvn`` but never uses it, ``instant_ngp.py:148``);
* ``InstantNeRFMLP`` applies no activation after ``fc_in`` — ReLU only
  follows the hidden layers (``instant_ngp.py:288-293``);
* raw (unnormalized, possibly negative) world coordinates are hashed; the
  spatial hash is int32 with wraparound multiply and non-negative modulo
  (``instant_ngp.py:558-568``).

Four table layouts (one quality/speed trade-space; quality numbers from
``scripts/experiments/packed_vs_hash_quality.py`` -> NGP_QUALITY.json):

* ``"hash"`` — reference-parity per-corner hashing (8 hash lookups per
  (point, level)). On TPU it runs through the per-corner scalar-gather
  kernels of ``ops.pallas.hash_corner`` (~8x the XLA gather path),
  identical math and gradients.
* ``"bricked"`` — the PRODUCTION layout: table rows hold 4^3 lattice-site
  patches with one-site overlap, so a voxel's corners always sit in one
  brick — one gathered row per (point, level) with the sites SHARED
  across each brick's 27 voxels (``ops.pallas.hash_brick``). Measured
  -0.12 dB vs "hash" at equal steps and ~16x less wall time.
* ``"packed"`` — the round-2 layout: the voxel's floor corner is hashed
  ONCE per (point, level) and all 8 corner feature vectors live in one
  lane-FOLDED table row (``ops.pallas.hash_fold``). Fastest, but corner
  copies are per-voxel private and novel-view PSNR drops 4-6 dB.
* ``"packed_dual"`` — packed plus a half-voxel-staggered second grid per
  level (partial cross-voxel coupling; still ~4 dB below reference).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu.models.hash_math import (
    CORNERS as _CORNERS,
    HASH_PRIMES as _HASH_PRIMES,
    LANES,
    level_resolutions,
    spatial_hash,
)

Params = Dict[str, Any]

__all__ = [
    "level_resolutions",
    "spatial_hash",
    "init_hash_table",
    "hash_encode",
    "hash_encode_corner128",
    "init_packed_hash_table",
    "unfold_packed_table",
    "hash_encode_packed",
    "hash_encode_packed128",
    "init_bricked_hash_table",
    "hash_encode_bricked128",
    "dual_resolutions_offsets",
    "init_small_mlp",
    "small_mlp_apply",
    "init_instant_ngp_params",
    "instant_ngp_apply",
]


def init_hash_table(
    key: jax.Array,
    num_level: int,
    log_max_entry_per_level: int,
    feat_dim: int,
) -> jnp.ndarray:
    """(L, T, F) tables, U(-1e-4, 1e-4) init (instant_ngp.py:366-372)."""
    shape = (num_level, 2**log_max_entry_per_level, feat_dim)
    return jax.random.uniform(key, shape, jnp.float32, -1e-4, 1e-4)


def hash_encode(
    tables: jnp.ndarray,
    coords: jnp.ndarray,
    resolutions: jnp.ndarray,
) -> jnp.ndarray:
    """Query all levels -> concatenated features (N, L * F).

    ``tables``: (L, T, F); ``coords``: (N, 3); ``resolutions``: (L,).

    TPU-first layout: the (level, corner) pair is folded into ONE trailing
    axis of width ``L * 8`` (= 128 lanes at the reference's L=16 — exactly a
    TPU vector register), so every large intermediate is an (N, L*8) tile
    with full lane occupancy. The naive (L, N, 8, 3) formulation tiles at
    ~10% utilization on TPU (trailing dims 3/8 pad to 128 lanes) and OOMs at
    the 1M-points-per-step operating point. Features are gathered from
    per-feature flat (L*T,) views with (N, L*8) int32 indices — a 1-D gather
    XLA lowers efficiently — instead of L separate (N, 8, F) gathers.
    """
    num_level, num_entries, feat_dim = tables.shape
    n = coords.shape[0]
    lanes = num_level * 8

    # per-lane constants: resolution and corner bit for each (level, corner)
    res_lane = jnp.repeat(resolutions, 8)  # (L*8,)
    corner_bits = jnp.tile(jnp.asarray(_CORNERS), (num_level, 1))  # (L*8, 3)
    level_offset = jnp.repeat(
        jnp.arange(num_level, dtype=jnp.int32) * num_entries, 8
    )  # (L*8,)

    idx = jnp.zeros((n, lanes), dtype=jnp.uint32)
    weights = jnp.ones((n, lanes), dtype=coords.dtype)
    primes = jnp.asarray(_HASH_PRIMES, dtype=jnp.uint32)
    for axis in range(3):
        scaled = coords[:, axis : axis + 1] * res_lane[None, :]  # (N, L*8)
        floor = jnp.floor(scaled)
        span = jnp.ceil(scaled) - floor  # 0 when scaled is integral
        bit = corner_bits[None, :, axis]
        vert = floor + bit * span
        opposite = floor + (1.0 - bit) * span
        # reference weight: product over dims of |opposite_corner - scaled|
        # (instant_ngp.py:442-475; all-zero when floor == ceil, preserved)
        weights = weights * jnp.abs(opposite - scaled)
        idx = jnp.bitwise_xor(idx, vert.astype(jnp.int32).astype(jnp.uint32) * primes[axis])

    # torch computes the xor in int32 then takes a sign-following modulo;
    # reinterpret as int32 before the mod to reproduce that exactly.
    idx = jnp.mod(idx.astype(jnp.int32), jnp.int32(num_entries))
    idx = idx + level_offset[None, :]  # index into the (L*T,) flat table

    # one 1-D gather per feature channel: (N, L*8) f32 tiles all the way
    flat_tables = tables.reshape(num_level * num_entries, feat_dim)
    blended = []
    for f in range(feat_dim):
        feats = jnp.take(flat_tables[:, f], idx, axis=0)  # (N, L*8)
        blended.append(
            jnp.sum(feats.reshape(n, num_level, 8) * weights.reshape(n, num_level, 8), axis=-1)
        )  # (N, L)
    # reference layout: level-major, feature-minor (N, L*F)
    return jnp.stack(blended, axis=-1).reshape(n, num_level * feat_dim)


def hash_encode_corner128(
    tables: jnp.ndarray,
    coords: jnp.ndarray,
    resolutions: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Reference-parity hash encode through the per-corner Pallas kernels ->
    (N, 128) feature LINES (lanes [0, L*F) carry the level-major features).

    Identical math to :func:`hash_encode` — same (L, T, F) parameter array,
    same per-corner spatial hash and trilinear weights — but the gathers and
    the gradient scatter run in the scalar-loop kernels of
    ``ops.pallas.hash_corner`` instead of XLA's index-rate-bound gather
    (measured ~60x faster at the production operating point). T must be a
    power of two with ``T % (128 // F) == 0`` (always true at the
    reference's 2^19 capacity).
    """
    from torch_nerf_tpu.ops.pallas.hash_corner import (  # noqa: PLC0415
        CornerCfg,
        encode_corner,
    )

    num_level, num_entries, feat_dim = tables.shape
    if num_level * feat_dim > 128:
        raise ValueError(
            f"hash_encode_corner128 packs L*F features into one 128-lane "
            f"line; got L={num_level}, F={feat_dim}"
        )
    # The kernel reduces hashes with bitwise-AND modulo and reshapes the
    # table to (T*F/128, 128) lines; a non-power-of-two T would silently
    # hash differently from the XLA ``hash_encode`` path, and T*F < 128
    # can't form one line. Reference configs (T=2^19) always satisfy both.
    if num_entries & (num_entries - 1):
        raise ValueError(
            f"hash_encode_corner128 needs a power-of-two table size "
            f"(bitwise-AND modulo); got num_entries={num_entries}"
        )
    if num_entries % (128 // feat_dim):
        raise ValueError(
            f"hash_encode_corner128 needs num_entries % (128 // feat_dim) "
            f"== 0 to pack whole 128-lane lines; got T={num_entries}, "
            f"F={feat_dim}"
        )
    n = coords.shape[0]
    # tile=512 keeps the per-step SMEM index block (L*8*tile ints) within
    # Mosaic's rank-1 s32 T(1024) tiling for any L, and the backward's
    # (L*8*tile, 128) update-row scratch at ~34 MB beside the 67 MB
    # gradient-table refs (measured ~3% faster than tile=256)
    tile = 512
    cfg = CornerCfg(
        feat_dim=feat_dim,
        num_entries=num_entries,
        num_level=num_level,
        use_kernel=True,
        interpret=interpret,
        tile=tile,
        group=min(8, num_level),
        place_bf16=not interpret,
    )
    # the full production batch (4096 rays x 256 samples = 2^20 points) runs
    # as ONE pallas call: the HBM-side (L*8, N) index streams are ~0.5 GB
    # and stream fine, while a lax.map over chunks makes XLA stage each
    # chunk's 67 MB output through scoped VMEM (observed OOM). Chunking
    # guards bigger (render-time) batches; the cap is sized from L so the
    # fwd+bwd index streams (2 x L*8*N int32 = L*64 bytes/point) stay
    # within ~1 GB of HBM regardless of batch size (2^20 points at L=16).
    max_chunk = max(tile, (1 << 30) // (num_level * 64) // tile * tile)
    chunk = min(max_chunk, -(-n // tile) * tile)
    padded_n = -(-n // chunk) * chunk
    # zero-padding is safe: integral scaled coords give all-zero weights
    coords_p = jnp.pad(coords, ((0, padded_n - n), (0, 0)))
    if padded_n == chunk:
        out = encode_corner(cfg, tables, coords_p, resolutions)
    else:
        out = jax.lax.map(
            lambda pts: encode_corner(cfg, tables, pts, resolutions),
            coords_p.reshape(-1, chunk, 3),
        ).reshape(padded_n, 128)
    return out[:n]


# ---------------------------------------------------------------------------
# voxel-packed, lane-folded layout: the TPU-fast hash grid (see module
# docstring and ops/pallas/hash_fold.py for the design rationale)


def init_packed_hash_table(
    key: jax.Array,
    num_level: int,
    log_max_entry_per_level: int,
    feat_dim: int,
) -> jnp.ndarray:
    """(L, rows/fold, 128) lane-folded voxel-packed tables, U(-1e-4, 1e-4).

    ``log_max_entry_per_level`` keeps the reference meaning (log2 of
    per-level corner-feature capacity): a packed row holds 8 corner slots,
    so the logical row count is ``2**log / 8`` and the parameter count per
    level is identical to the reference layout's ``2**log * F``. ``fold``
    rows share one 128-lane line (a pure reshape of the packed layout).
    """
    from torch_nerf_tpu.ops.pallas.hash_fold import fold_factor  # noqa: PLC0415

    fold = fold_factor(feat_dim)
    rows = 2**log_max_entry_per_level // 8
    if rows % fold != 0:
        raise ValueError(
            f"log_max_entry_per_level={log_max_entry_per_level} too small for "
            f"feat_dim={feat_dim} (need at least {fold} packed rows per line)"
        )
    shape = (num_level, rows // fold, LANES)
    return jax.random.uniform(key, shape, jnp.float32, -1e-4, 1e-4)


def unfold_packed_table(tables: jnp.ndarray, feat_dim: int) -> jnp.ndarray:
    """Folded (L, rows/fold, 128) -> logical packed (L, rows, 8F) view."""
    num_level, t_fold, _ = tables.shape
    fold = LANES // (8 * feat_dim)
    return tables.reshape(num_level, t_fold * fold, 8 * feat_dim)


def hash_encode_packed128(
    tables: jnp.ndarray,
    coords: jnp.ndarray,
    resolutions: jnp.ndarray,
    feat_dim: int,
    interpret: bool = False,
    offsets: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Voxel-packed query of all levels -> (N, 128) feature LINES: the
    level-major packed features occupy lanes [0, L*F), the rest are zero.

    This is the production shape — it feeds the (lane-padded) density MLP
    directly so no narrow (N, L*F) array ever exists on TPU. ``tables``:
    (L, rows/fold, 128) folded; ``coords``: (N, 3); ``resolutions``: (L,).
    Points are processed in chunks sized so the level-major (L, chunk, 128)
    weight-line stream stays ~1 GiB; the backward recomputes that stream
    instead of saving it (see ``ops.pallas.hash_fold.encode_folded``). On
    TPU the lookups run in the Pallas kernels; elsewhere an equivalent XLA
    path is used (``interpret=True`` forces the kernels in interpreter
    mode for tests).
    """
    from torch_nerf_tpu.ops.pallas.hash_fold import FoldCfg, encode_folded  # noqa: PLC0415

    num_level, t_fold, _ = tables.shape
    fold = LANES // (8 * feat_dim)
    num_rows = t_fold * fold
    n = coords.shape[0]
    if offsets is None:
        offsets = jnp.zeros_like(resolutions)
    use_kernel = interpret or jax.default_backend() == "tpu"

    # tile: multiple of 1024 — XLA lays out rank-1 s32 arrays with tiling
    # T(1024), and Mosaic rejects SMEM blocks that don't align with it
    # (small batches crashed the round-1 kernel this way, ADVICE.md). The
    # per-step SMEM index block is (L*tile,) and the backward's update-row
    # scratch is (L*tile, 128) f32, so the tile shrinks as L grows. Chunking
    # only guards truly huge batches: per-chunk HBM side arrays are just the
    # (L, chunk) int32 index streams (weights are built in-kernel), so the
    # full 1M-point production step runs as ONE pallas call.
    tile = min(4096, max(1024, (1 << 15) // num_level), -(-n // 1024) * 1024)
    max_chunk = tile * max(1, (1 << 21) // tile)
    chunk = min(max_chunk, -(-n // tile) * tile)
    padded_n = -(-n // chunk) * chunk
    # zero-padding is safe: integral scaled coords give all-zero weights
    coords_p = jnp.pad(coords, ((0, padded_n - n), (0, 0)))
    cfg = FoldCfg(
        feat_dim=feat_dim,
        num_rows=num_rows,
        num_level=num_level,
        use_kernel=use_kernel,
        interpret=interpret,
        tile=tile,
        # group=8: one level per accumulator ref — consecutive RMWs in the
        # scatter loop are 8 apart, clearing the add latency chain (measured
        # 2.3 ms/step faster than group=4 at the L4F8-dual operating point)
        group=min(int(os.environ.get("TNT_FOLD_GROUP", "8")), num_level),
        bwd_unroll=int(os.environ.get("TNT_FOLD_BWD_UNROLL", "4")),
        # bf16 lane-placement matmuls only on the real-TPU path; interpreter
        # runs (tests) keep f32 so parity against packed_prep math is exact
        place_bf16=not interpret,
    )

    if padded_n == chunk:
        out = encode_folded(cfg, tables, coords_p, resolutions, offsets)
    else:
        out = jax.lax.map(
            lambda pts: encode_folded(cfg, tables, pts, resolutions, offsets),
            coords_p.reshape(-1, chunk, 3),
        ).reshape(padded_n, LANES)
    return out[:n]


def hash_encode_packed(
    tables: jnp.ndarray,
    coords: jnp.ndarray,
    resolutions: jnp.ndarray,
    feat_dim: int,
    interpret: bool = False,
    offsets: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Voxel-packed query of all levels -> (N, L * F) (the narrow view of
    ``hash_encode_packed128``, for API parity with ``hash_encode``)."""
    num_level = tables.shape[0]
    out = hash_encode_packed128(tables, coords, resolutions, feat_dim, interpret, offsets)
    return out[:, : num_level * feat_dim]


# ---------------------------------------------------------------------------
# corner-shared brick layout: one gathered line per (point, level) like
# "packed", but lattice sites shared across the brick's 3^3 voxels (see
# ops/pallas/hash_brick.py for the design rationale and trade-offs)


def init_bricked_hash_table(
    key: jax.Array,
    num_level: int,
    log_max_entry_per_level: int,
    feat_dim: int,
) -> jnp.ndarray:
    """(L, T_b, 128) brick tables, U(-1e-4, 1e-4), at the reference budget
    (``T_b * 128 = 2^log * F`` floats per level)."""
    from torch_nerf_tpu.ops.pallas.hash_brick import bricks_per_level  # noqa: PLC0415

    t_b = bricks_per_level(log_max_entry_per_level, feat_dim)
    return jax.random.uniform(
        key, (num_level, t_b, LANES), jnp.float32, -1e-4, 1e-4
    )


def hash_encode_bricked128(
    tables: jnp.ndarray,
    coords: jnp.ndarray,
    resolutions: jnp.ndarray,
    feat_dim: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Brick-shared query of all levels -> (N, 128) feature lines (lanes
    [0, L*F) carry the level-major packed features, the rest are zero).

    One gathered row per (point, level) — packed-layout cost — with lattice
    sites shared across each brick's 3x3x3 voxels (``ops.pallas.
    hash_brick``). On TPU the lookups run in the Pallas kernels; elsewhere
    an equivalent XLA path (``interpret=True`` forces the kernels in
    interpreter mode for tests).
    """
    from torch_nerf_tpu.ops.pallas.hash_brick import (  # noqa: PLC0415
        BRICK_EDGE,
        BrickCfg,
        encode_brick,
    )

    num_level, t_b, _ = tables.shape
    if BRICK_EDGE**3 * feat_dim != LANES:
        raise ValueError(f"bricked layout requires F={LANES // BRICK_EDGE**3}")
    if num_level * feat_dim > LANES:
        raise ValueError("bricked layout packs L*F features into 128 lanes")
    n = coords.shape[0]
    use_kernel = interpret or jax.default_backend() == "tpu"
    tile = 512
    cfg = BrickCfg(
        feat_dim=feat_dim,
        num_bricks=t_b,
        num_level=num_level,
        use_kernel=use_kernel,
        interpret=interpret,
        tile=tile,
        group=min(8, num_level),
        place_bf16=not interpret,
    )
    max_chunk = max(tile, (1 << 22) // tile * tile)
    chunk = min(max_chunk, -(-n // tile) * tile)
    padded_n = -(-n // chunk) * chunk
    # zero-padding is safe: integral scaled coords give all-zero weights
    coords_p = jnp.pad(coords, ((0, padded_n - n), (0, 0)))
    if padded_n == chunk:
        out = encode_brick(cfg, tables, coords_p, resolutions)
    else:
        out = jax.lax.map(
            lambda pts: encode_brick(cfg, tables, pts, resolutions),
            coords_p.reshape(-1, chunk, 3),
        ).reshape(padded_n, LANES)
    return out[:n]


def dual_resolutions_offsets(resolutions: jnp.ndarray):
    """Pseudo-level (2L,) resolutions/offsets for the dual-grid layout.

    Levels [0, L) are the base grids (offset 0); levels [L, 2L) repeat the
    same resolutions with the scaled coordinates shifted by +0.5 — a
    half-voxel-staggered second grid per level. A lattice corner of the base
    grid sits at the CENTER of a staggered voxel (and vice versa), so
    adjacent base voxels always share staggered rows: the cross-voxel
    coupling the plain packed layout lacks (NGP_QUALITY.json shows packed
    overfitting novel views by ~4.5 dB without it).
    """
    res2 = jnp.concatenate([resolutions, resolutions])
    off2 = jnp.concatenate(
        [jnp.zeros_like(resolutions), jnp.full_like(resolutions, 0.5)]
    )
    return res2, off2


# ---------------------------------------------------------------------------
# small MLPs


def _init_linear(key: jax.Array, fan_in: int, fan_out: int) -> Dict[str, jnp.ndarray]:
    bound = 1.0 / np.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    return {
        "w": jax.random.uniform(wkey, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(bkey, (fan_out,), jnp.float32, -bound, bound),
    }


def init_small_mlp(
    key: jax.Array, in_dim: int, out_dim: int, feat_dim: int, num_hidden_layer: int
) -> Params:
    keys = jax.random.split(key, num_hidden_layer + 2)
    params = {"fc_in": _init_linear(keys[0], in_dim, feat_dim)}
    for i in range(num_hidden_layer):
        params[f"fc_hidden_{i}"] = _init_linear(keys[i + 1], feat_dim, feat_dim)
    params["fc_out"] = _init_linear(keys[-1], feat_dim, out_dim)
    return params


def small_mlp_apply(params: Params, x: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    """fc_in (no activation) -> [relu(hidden)]* -> fc_out (no activation).

    Matches ``InstantNeRFMLP.forward`` (``instant_ngp.py:286-295``).
    """
    def linear(p, v):
        return (
            jnp.dot(v, p["w"].astype(compute_dtype), preferred_element_type=jnp.float32)
            .astype(compute_dtype)
            + p["b"].astype(compute_dtype)
        )

    x = x.astype(compute_dtype)
    out = linear(params["fc_in"], x)
    i = 0
    while f"fc_hidden_{i}" in params:
        out = jax.nn.relu(linear(params[f"fc_hidden_{i}"], out))
        i += 1
    return linear(params["fc_out"], out).astype(jnp.float32)


# ---------------------------------------------------------------------------
# full model


def init_instant_ngp_params(
    key: jax.Array,
    view_dir_dim: int,
    num_level: int = 16,
    log_max_entry_per_level: int = 19,
    table_feat_dim: int = 2,
    density_feat_dim: int = 64,
    color_feat_dim: int = 64,
    table_layout: str = "hash",
) -> Params:
    """Full parameter pytree: hash tables + density MLP + color MLP.

    Dims per ``instant_ngp.py:74-105``: density MLP (L*F -> 64 -> 16, one
    hidden layer), color MLP (16 + view_dir_dim -> 64 -> 64 -> 3, two hidden
    layers). ``table_layout``: "hash" = reference-parity per-corner hashing;
    "packed" = TPU-fast lane-folded voxel rows (see ``hash_encode_packed``).
    """
    table_key, density_key, color_key = jax.random.split(key, 3)
    density_mlp_out = 16
    encode_dim = num_level * table_feat_dim
    if table_layout == "hash":
        tables = init_hash_table(
            table_key, num_level, log_max_entry_per_level, table_feat_dim
        )
    elif table_layout == "packed":
        tables = init_packed_hash_table(
            table_key, num_level, log_max_entry_per_level, table_feat_dim
        )
    elif table_layout == "packed_dual":
        # two half-voxel-staggered packed grids per level = 2L pseudo-levels
        # (see dual_resolutions_offsets); the encode is 2x wider
        tables = init_packed_hash_table(
            table_key, 2 * num_level, log_max_entry_per_level, table_feat_dim
        )
        encode_dim = 2 * num_level * table_feat_dim
    elif table_layout == "bricked":
        tables = init_bricked_hash_table(
            table_key, num_level, log_max_entry_per_level, table_feat_dim
        )
    else:
        raise ValueError(f"Unknown table_layout '{table_layout}'.")
    return {
        "tables": tables,
        "density_mlp": init_small_mlp(
            density_key,
            encode_dim,
            density_mlp_out,
            density_feat_dim,
            num_hidden_layer=1,
        ),
        "color_mlp": init_small_mlp(
            color_key,
            density_mlp_out + view_dir_dim,
            3,
            color_feat_dim,
            num_hidden_layer=2,
        ),
    }


def instant_ngp_apply(
    params: Params,
    pos: jnp.ndarray,
    view_dir_enc: jnp.ndarray,
    resolutions: jnp.ndarray,
    is_hdr: bool = False,
    compute_dtype=jnp.float32,
    table_layout: str = "hash",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sigma, rgb) at raw 3D positions + encoded view dirs.

    ``pos``: (..., 3) raw coordinates; ``view_dir_enc``: (..., D) SH-encoded
    directions. Density = ``2 ** out[..., 0]`` (``instant_ngp.py:148``);
    color activation sigmoid (or exp for HDR).
    """
    batch_shape = pos.shape[:-1]
    flat_pos = pos.reshape(-1, 3)
    flat_dir = view_dir_enc.reshape(-1, view_dir_enc.shape[-1])

    if table_layout == "hash":
        tab = params["tables"]
        if jax.default_backend() == "tpu" and tab.shape[0] * tab.shape[2] <= LANES:
            # per-corner Pallas kernels: same math, (N, 128) feature lines
            # feeding a zero-row-padded fc_in (identical product)
            feats = hash_encode_corner128(params["tables"], flat_pos, resolutions)
            w_in = params["density_mlp"]["fc_in"]["w"]
            density_mlp = dict(params["density_mlp"])
            density_mlp["fc_in"] = {
                "w": jnp.pad(w_in, ((0, LANES - w_in.shape[0]), (0, 0))),
                "b": params["density_mlp"]["fc_in"]["b"],
            }
        else:
            feats = hash_encode(params["tables"], flat_pos, resolutions)
            density_mlp = params["density_mlp"]
    else:
        num_level = params["tables"].shape[0]  # 2L pseudo-levels when dual
        feat_dim = params["density_mlp"]["fc_in"]["w"].shape[0] // num_level
        if table_layout == "bricked":
            feats = hash_encode_bricked128(
                params["tables"], flat_pos, resolutions, feat_dim
            )
        else:
            offsets = None
            if table_layout == "packed_dual":
                resolutions, offsets = dual_resolutions_offsets(resolutions)
            # 128-lane feature lines feed an fc_in zero-padded to 128 input
            # rows (identical math, no narrow arrays on the TPU hot path)
            feats = hash_encode_packed128(
                params["tables"], flat_pos, resolutions, feat_dim, offsets=offsets
            )
        w_in = params["density_mlp"]["fc_in"]["w"]
        density_mlp = dict(params["density_mlp"])
        density_mlp["fc_in"] = {
            "w": jnp.pad(w_in, ((0, LANES - w_in.shape[0]), (0, 0))),
            "b": params["density_mlp"]["fc_in"]["b"],
        }
    density_out = small_mlp_apply(density_mlp, feats, compute_dtype)
    sigma = jnp.exp2(density_out[..., 0])

    color_in = jnp.concatenate([density_out, flat_dir], axis=-1)
    color_out = small_mlp_apply(params["color_mlp"], color_in, compute_dtype)
    rgb = jnp.exp(color_out) if is_hdr else jax.nn.sigmoid(color_out)

    return sigma.reshape(batch_shape), rgb.reshape(*batch_shape, 3)
