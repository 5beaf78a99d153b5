"""Shared hash-grid math: spatial hash, trilinear corner weights, and the
voxel-packed index/weight preparation used by the folded Pallas kernels.

Pure ``jnp`` vector code with no Pallas dependency, so both
``models.instant_ngp`` (model layer) and ``ops.pallas.hash_fold`` (kernel
layer) can import it.

Reference semantics preserved (``/root/reference/torch_nerf/src/network/
instant_ngp.py``): Teschner-prime XOR hash in int32 with wraparound multiply
and non-negative modulo (``:558-568``); corners from floor/ceil so integral
coordinates produce all-zero trilinear weights (``:442-475``); weight of a
corner = product over dims of |opposite_corner - scaled| (``:442-475``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128

# Teschner et al. 2003 spatial-hash primes (instant_ngp.py:558-562)
HASH_PRIMES = (1, 2654435761, 805459861)

# (8, 3) corner selector: 0 -> floor, 1 -> ceil; ordering matches the
# reference's fff, cff, fcf, ffc, ccf, cfc, fcc, ccc (instant_ngp.py:420-440)
CORNERS = np.array(
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
    if num_level == 1:
        return np.asarray([float(min_res)], dtype=np.float32)
    coeff = (max_res / min_res) ** (1.0 / (num_level - 1))
    return np.floor(min_res * coeff ** np.arange(num_level)).astype(np.float32)


def spatial_hash(vert_coords: jnp.ndarray, num_entries: int) -> jnp.ndarray:
    """XOR of prime-multiplied int32 coords, mod table size -> (...,).

    ``vert_coords``: (..., 3) int32. Multiplication wraps in int32 exactly as
    torch's does; ``%`` returns non-negative values for a positive modulus in
    both frameworks.
    """
    primes = jnp.asarray(HASH_PRIMES, dtype=jnp.uint32)
    v = vert_coords.astype(jnp.uint32) * primes
    h = jnp.bitwise_xor(jnp.bitwise_xor(v[..., 0], v[..., 1]), v[..., 2])
    # torch computes the xor in int32 then takes a sign-following modulo;
    # reinterpret as int32 before the mod to reproduce that exactly.
    h_signed = h.astype(jnp.int32)
    return jnp.mod(h_signed, jnp.int32(num_entries)).astype(jnp.int32)


def packed_prep(
    coords: jnp.ndarray,
    resolutions: jnp.ndarray,
    num_rows: int,
    feat_dim: int,
    offsets: jnp.ndarray | None = None,
):
    """Voxel-packed lookup preparation, computed level-major and lane-DENSE.

    For each (level, point): hash the voxel's FLOOR corner once ->
    ``row`` in [0, num_rows), then split into the folded coordinates
    ``row // fold`` (the 128-lane line) and ``row % fold`` (the slot within
    it), and build the slot-positioned weight line ``w128`` (L, N, 128):
    lanes ``8F*slot + F*c + f`` carry corner c's trilinear weight, all other
    lanes are zero. ``sum(rows * w128)`` grouped by ``lane % F`` is then
    exactly the packed trilinear blend.

    Every intermediate here is either (L, N) or (L, N, 128): the per-corner
    weight of each LANE is computed directly from that lane's corner bits
    (one fused elementwise chain). Building the weights as (L, N, 8) /
    (L, N, 8F) intermediates instead pads every trailing dim to 128 lanes
    and was measured at ~450 ms/step at the production operating point —
    ~30x the cost of this dense formulation.

    ``offsets`` (L,) shifts each level's SCALED coordinates before the voxel
    floor/hash — the half-voxel stagger of the dual-grid layout rides through
    as ``scaled = res * p + offset`` (0 everywhere for plain packed).

    Returns (idx_fold (L, N) int32, w128 (L, N, 128) float32).
    """
    fold = LANES // (8 * feat_dim)
    n = coords.shape[0]
    num_level = resolutions.shape[0]
    primes = jnp.asarray(HASH_PRIMES, dtype=jnp.uint32)
    lane = np.arange(LANES)
    # constant per-lane corner bits: lane = 8F*slot + F*corner + feat
    corner_of_lane = (lane % (8 * feat_dim)) // feat_dim  # (128,)
    slot_of_lane = jnp.asarray(lane // (8 * feat_dim), dtype=jnp.int32)
    bits = jnp.asarray(CORNERS[corner_of_lane])  # (128, 3)

    if offsets is None:
        offsets = jnp.zeros_like(resolutions)
    idx = jnp.zeros((num_level, n), dtype=jnp.uint32)
    w128 = jnp.ones((num_level, n, LANES), dtype=jnp.float32)
    for axis in range(3):
        scaled = resolutions[:, None] * coords[None, :, axis] + offsets[:, None]
        floor = jnp.floor(scaled)
        span = jnp.ceil(scaled) - floor  # 0 when scaled is integral
        idx = jnp.bitwise_xor(
            idx, floor.astype(jnp.int32).astype(jnp.uint32) * primes[axis]
        )
        # |opposite_corner - scaled| == bit ? frac : span - frac, with frac
        # and span at (L, N) — only the select and multiply run per lane
        # (the reference |opposite - scaled| form costs ~2.5x more VPU time)
        frac = scaled - floor
        bit = bits[None, None, :, axis] > 0.5  # (1, 1, 128) bool
        w128 = w128 * jnp.where(bit, frac[..., None], (span - frac)[..., None])

    row = jnp.mod(idx.astype(jnp.int32), jnp.int32(num_rows))  # (L, N)
    idx_fold = row // fold
    slot = row % fold
    w128 = jnp.where(slot[..., None] == slot_of_lane, w128, 0.0)
    return idx_fold, w128
