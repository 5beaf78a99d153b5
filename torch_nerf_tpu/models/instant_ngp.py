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
    """
    num_level, num_entries, feat_dim = tables.shape
    corners = jnp.asarray(_CORNERS)  # (8, 3)

    scaled = resolutions[:, None, None] * coords[None, :, :]  # (L, N, 3)
    floor = jnp.floor(scaled)
    ceil = jnp.ceil(scaled)

    # corner positions (L, N, 8, 3) and their trilinear weights
    corner_pos = floor[:, :, None, :] + corners[None, None, :, :] * (
        ceil - floor
    )[:, :, None, :]
    # reference weight: product over dims of |opposite_corner - scaled|
    opposite = floor[:, :, None, :] + (1.0 - corners[None, None, :, :]) * (
        ceil - floor
    )[:, :, None, :]
    weights = jnp.prod(
        jnp.abs(opposite - scaled[:, :, None, :]), axis=-1
    )  # (L, N, 8)

    idx = spatial_hash(corner_pos.astype(jnp.int32), num_entries)  # (L, N, 8)

    # per-level gather: vmap over the leading level axis
    def gather_level(table, level_idx):
        return table[level_idx]  # (N, 8, F)

    feats = jax.vmap(gather_level)(tables, idx)  # (L, N, 8, F)
    blended = jnp.sum(feats * weights[..., None], axis=2)  # (L, N, F)
    return jnp.moveaxis(blended, 0, 1).reshape(coords.shape[0], num_level * feat_dim)


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
) -> Params:
    """Full parameter pytree: hash tables + density MLP + color MLP.

    Dims per ``instant_ngp.py:74-105``: density MLP (L*F -> 64 -> 16, one
    hidden layer), color MLP (16 + view_dir_dim -> 64 -> 64 -> 3, two hidden
    layers).
    """
    table_key, density_key, color_key = jax.random.split(key, 3)
    density_mlp_out = 16
    return {
        "tables": init_hash_table(
            table_key, num_level, log_max_entry_per_level, table_feat_dim
        ),
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
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sigma, rgb) at raw 3D positions + encoded view dirs.

    ``pos``: (..., 3) raw coordinates; ``view_dir_enc``: (..., D) SH-encoded
    directions. Density = ``2 ** out[..., 0]`` (``instant_ngp.py:148``);
    color activation sigmoid (or exp for HDR).
    """
    batch_shape = pos.shape[:-1]
    flat_pos = pos.reshape(-1, 3)
    flat_dir = view_dir_enc.reshape(-1, view_dir_enc.shape[-1])

    feats = hash_encode(params["tables"], flat_pos, resolutions)
    density_out = small_mlp_apply(params["density_mlp"], feats, compute_dtype)
    sigma = jnp.exp2(density_out[..., 0])

    color_in = jnp.concatenate([density_out, flat_dir], axis=-1)
    color_out = small_mlp_apply(params["color_mlp"], color_in, compute_dtype)
    rgb = jnp.exp(color_out) if is_hdr else jax.nn.sigmoid(color_out)

    return sigma.reshape(batch_shape), rgb.reshape(*batch_shape, 3)
