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
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]

# Teschner et al. 2003 spatial-hash primes (instant_ngp.py:558-562)
_HASH_PRIMES = (1, 2654435761, 805459861)

# (8, 3) corner selector: 0 -> floor, 1 -> ceil; ordering matches the
# reference's fff, cff, fcf, ffc, ccf, cfc, fcc, ccc (instant_ngp.py:420-440)
_CORNERS = np.array(
    [
        [0, 0, 0],
        [1, 0, 0],
        [0, 1, 0],
        [0, 0, 1],
        [1, 1, 0],
        [1, 0, 1],
        [0, 1, 1],
        [1, 1, 1],
    ],
    dtype=np.float32,
)


def level_resolutions(num_level: int, min_res: int, max_res: int) -> np.ndarray:
    """Geometric progression floor(min * b^l), b = (max/min)^(1/(L-1))."""
    coeff = (max_res / min_res) ** (1.0 / (num_level - 1))
    return np.floor(min_res * coeff ** np.arange(num_level)).astype(np.float32)


def spatial_hash(vert_coords: jnp.ndarray, num_entries: int) -> jnp.ndarray:
    """XOR of prime-multiplied int32 coords, mod table size -> (...,).

    ``vert_coords``: (..., 3) int32. Multiplication wraps in int32 exactly as
    torch's does; ``%`` returns non-negative values for a positive modulus in
    both frameworks.
    """
    primes = jnp.asarray(_HASH_PRIMES, dtype=jnp.uint32)
    v = vert_coords.astype(jnp.uint32) * primes
    h = jnp.bitwise_xor(jnp.bitwise_xor(v[..., 0], v[..., 1]), v[..., 2])
    # torch computes the xor in int32 then takes a sign-following modulo;
    # reinterpret as int32 before the mod to reproduce that exactly.
    h_signed = h.astype(jnp.int32)
    return jnp.mod(h_signed, jnp.int32(num_entries)).astype(jnp.int32)


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


# ---------------------------------------------------------------------------
# voxel-packed layout: the TPU-fast hash grid
#
# Measured on TPU v5e: XLA's gather/scatter runs at a fixed INDEX rate
# (~70M element-indices/s; ~155M row-indices/s regardless of row width), so
# hash-grid throughput is set by the NUMBER of gather indices, not bytes.
# The reference layout needs L*8 = 128 element lookups per sample point
# (~270M indices/step at the 4096x256 operating point -> seconds per step).
# The packed layout hashes the voxel's FLOOR corner once per (point, level)
# and stores all 8 corner features contiguously in one table row
# -> L = 16 row lookups per point, a ~16x reduction in gather indices and
# an ~8x reduction in backward scatter indices.
#
# Trade-off (documented, opt-in via ``table_layout="packed"``): lattice
# corners are no longer shared between adjacent voxels, so the encoded
# field is trilinear within each voxel but may be discontinuous across
# voxel boundaries (adjacent voxels learn independent copies of the shared
# corner, trained from the same photometric signal). This is the same class
# of approximation as non-shared "texture patch" grids; reconstruction
# quality is validated by the overfit tests.


def init_packed_hash_table(
    key: jax.Array,
    num_level: int,
    log_max_entry_per_level: int,
    feat_dim: int,
) -> jnp.ndarray:
    """(L, T/8, 8*F) voxel-packed tables, U(-1e-4, 1e-4) init.

    ``log_max_entry_per_level`` keeps the reference meaning (log2 of
    per-level corner-feature capacity): a packed row holds 8 corner slots,
    so the row count is ``2**log / 8`` and the parameter count per level is
    identical to the reference layout's ``2**log * F``.
    """
    shape = (num_level, 2**log_max_entry_per_level // 8, 8 * feat_dim)
    return jax.random.uniform(key, shape, jnp.float32, -1e-4, 1e-4)


@jax.custom_vjp
def _packed_rows_lookup(tables: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather packed rows: (L, T, W) tables + (C, L) level-local row ids
    -> (C, L, W).

    Forward is XLA's row gather (~155M rows/s on v5e). The backward —
    a scatter-add of the cotangent rows — is the Pallas VMEM kernel in
    ``ops.pallas.hash_scatter`` (~7x XLA's scatter); on non-TPU backends it
    falls back to XLA's native scatter.
    """
    num_level, num_rows, w = tables.shape
    level_offset = jnp.arange(num_level, dtype=jnp.int32) * num_rows
    flat = tables.reshape(num_level * num_rows, w)
    rows = jnp.take(flat, (idx + level_offset[None, :]).reshape(-1), axis=0)
    return rows.reshape(idx.shape[0], num_level, w)


def _packed_rows_lookup_fwd(tables, idx):
    return _packed_rows_lookup(tables, idx), (idx, tables.shape)


def _packed_rows_lookup_bwd(residuals, g_rows):
    idx, (num_level, num_rows, w) = residuals
    if jax.default_backend() == "tpu":
        from torch_nerf_tpu.ops.pallas.hash_scatter import scatter_add_per_level  # noqa: PLC0415

        dtables = scatter_add_per_level(idx, g_rows.astype(jnp.float32), num_rows)
    else:
        level_offset = jnp.arange(num_level, dtype=jnp.int32) * num_rows
        flat_idx = (idx + level_offset[None, :]).reshape(-1)
        dflat = jnp.zeros((num_level * num_rows, w), jnp.float32)
        dflat = dflat.at[flat_idx].add(g_rows.reshape(-1, w).astype(jnp.float32))
        dtables = dflat.reshape(num_level, num_rows, w)
    import numpy as _np  # noqa: PLC0415

    didx = _np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return dtables, didx


_packed_rows_lookup.defvjp(_packed_rows_lookup_fwd, _packed_rows_lookup_bwd)


def hash_encode_packed(
    tables: jnp.ndarray,
    coords: jnp.ndarray,
    resolutions: jnp.ndarray,
    chunk: int = 131072,
) -> jnp.ndarray:
    """Voxel-packed query: all levels -> (N, L * F).

    ``tables``: (L, T, 8*F); ``coords``: (N, 3); ``resolutions``: (L,).
    Points are processed in ``lax.map`` chunks: each gathered row is padded
    to 128 lanes by the TPU tiling, so the (chunk*L, 8*F) gather buffer is
    bounded (~1 GiB padded at the default chunk) instead of materializing
    (N*L, 128) for the full batch. 128Ki points/chunk measured ~3% faster
    end-to-end than 64Ki (fewer scan iterations) while keeping peak HBM low.
    """
    num_level, num_entries, row_dim = tables.shape
    feat_dim = row_dim // 8
    n = coords.shape[0]
    chunk = min(chunk, -(-n // 8) * 8)  # small inputs: one right-sized chunk
    primes = jnp.asarray(_HASH_PRIMES, dtype=jnp.uint32)
    corner_bits = jnp.asarray(_CORNERS)  # (8, 3)

    padded_n = -(-n // chunk) * chunk
    coords_p = jnp.pad(coords, ((0, padded_n - n), (0, 0)))
    chunks = coords_p.reshape(padded_n // chunk, chunk, 3)

    def encode_chunk(pts: jnp.ndarray) -> jnp.ndarray:
        idx = jnp.zeros((chunk, num_level), dtype=jnp.uint32)
        # per-(level, corner) trilinear weights, lanes = L*8
        weights = jnp.ones((chunk, num_level * 8), dtype=pts.dtype)
        for axis in range(3):
            scaled = pts[:, axis : axis + 1] * resolutions[None, :]  # (C, L)
            floor = jnp.floor(scaled)
            span = jnp.ceil(scaled) - floor
            # voxel identity = floor corner only (one hash per level)
            idx = jnp.bitwise_xor(
                idx, floor.astype(jnp.int32).astype(jnp.uint32) * primes[axis]
            )
            bit = jnp.tile(corner_bits[:, axis], (num_level,))[None, :]  # (1, L*8)
            rep = jnp.repeat(scaled, 8, axis=-1)  # (C, L*8)
            span8 = jnp.repeat(span, 8, axis=-1)
            floor8 = jnp.repeat(floor, 8, axis=-1)
            opposite = floor8 + (1.0 - bit) * span8
            weights = weights * jnp.abs(opposite - rep)

        idx = jnp.mod(idx.astype(jnp.int32), jnp.int32(num_entries))  # (C, L)

        rows = _packed_rows_lookup(tables, idx)  # (C, L, 8*F)
        feats = rows.reshape(chunk, num_level, 8, feat_dim)
        w = weights.reshape(chunk, num_level, 8)
        blended = jnp.sum(feats * w[..., None], axis=2)  # (C, L, F)
        return blended.reshape(chunk, num_level * feat_dim)

    out = jax.lax.map(encode_chunk, chunks)
    return out.reshape(padded_n, num_level * feat_dim)[:n]


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
    "packed" = TPU-fast voxel-packed rows (see ``hash_encode_packed``).
    """
    table_key, density_key, color_key = jax.random.split(key, 3)
    density_mlp_out = 16
    if table_layout == "hash":
        tables = init_hash_table(
            table_key, num_level, log_max_entry_per_level, table_feat_dim
        )
    elif table_layout == "packed":
        tables = init_packed_hash_table(
            table_key, num_level, log_max_entry_per_level, table_feat_dim
        )
    else:
        raise ValueError(f"Unknown table_layout '{table_layout}'.")
    return {
        "tables": tables,
        "density_mlp": init_small_mlp(
            density_key,
            num_level * table_feat_dim,
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

    encode = hash_encode if table_layout == "hash" else hash_encode_packed
    feats = encode(params["tables"], flat_pos, resolutions)
    density_out = small_mlp_apply(params["density_mlp"], feats, compute_dtype)
    sigma = jnp.exp2(density_out[..., 0])

    color_in = jnp.concatenate([density_out, flat_dir], axis=-1)
    color_out = small_mlp_apply(params["color_mlp"], color_in, compute_dtype)
    rgb = jnp.exp(color_out) if is_hdr else jax.nn.sigmoid(color_out)

    return sigma.reshape(batch_shape), rgb.reshape(*batch_shape, 3)
