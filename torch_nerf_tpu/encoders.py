"""Input signal encoders — positional (sinusoidal) and spherical harmonics.

Pure functions replacing the reference's encoder classes
(``/root/reference/torch_nerf/src/signal_encoder/positional_encoder.py:12-114``
and ``spherical_harmonics_encoder.py:12-139``). Both are elementwise fan-outs
that XLA fuses into the downstream matmul, so no Pallas kernel is needed for
them in isolation — the fused render kernel (ops/pallas) inlines the same
math.
"""

from __future__ import annotations

import jax.numpy as jnp

# Real spherical-harmonics coefficients, identical to the reference tables
# (``spherical_harmonics_encoder.py:41-69``).
_SH_C0 = 0.28209479177387814
_SH_C1 = 0.4886025119029199
_SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
_SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
_SH_C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def positional_encoding_dim(in_dim: int, num_levels: int, include_input: bool) -> int:
    """Output dimensionality: ``2 * L * d`` (+``d`` if the raw input is kept).

    Matches ``positional_encoder.py:42-44``.
    """
    out = 2 * num_levels * in_dim
    if include_input:
        out += in_dim
    return out


def positional_encoding(
    x: jnp.ndarray, num_levels: int, include_input: bool = True
) -> jnp.ndarray:
    """Sinusoidal positional encoding, official-NeRF variant (no pi factor).

    Output layout (matching ``positional_encoder.py:96-104``):
    ``[x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]`` where each
    term spans all ``in_dim`` channels. ``x`` has shape ``(..., d)``; output
    has shape ``(..., positional_encoding_dim(d, L, include_input))``.
    """
    parts = []
    if include_input:
        parts.append(x)
    for level in range(num_levels):
        freq = float(2**level)
        parts.append(jnp.sin(freq * x))
        parts.append(jnp.cos(freq * x))
    return jnp.concatenate(parts, axis=-1)


def sh_encoding_dim(degree: int) -> int:
    """Output dimensionality ``degree ** 2`` (``spherical_harmonics_encoder.py:44``)."""
    return degree * degree


def sh_encoding(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Real spherical-harmonics encoding of 3D direction vectors.

    ``dirs`` has shape ``(..., 3)``; output ``(..., degree**2)``. Component
    ordering, signs, and coefficients match the reference evaluation
    (``spherical_harmonics_encoder.py:98-137``), including the constant DC
    term and the degree-1 ``(-y, z, -x)`` ordering.
    """
    if degree < 1 or degree > 5:
        raise ValueError(f"SH degree must be in [1, 5]. Got {degree}.")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)

    comps = [_SH_C0 * one]
    if degree > 1:
        comps += [-_SH_C1 * y, _SH_C1 * z, -_SH_C1 * x]
    if degree > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        comps += [
            _SH_C2[0] * xy,
            _SH_C2[1] * yz,
            _SH_C2[2] * (2.0 * zz - xx - yy),
            _SH_C2[3] * xz,
            _SH_C2[4] * (xx - yy),
        ]
    if degree > 3:
        comps += [
            _SH_C3[0] * y * (3.0 * xx - yy),
            _SH_C3[1] * xy * z,
            _SH_C3[2] * y * (4.0 * zz - xx - yy),
            _SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _SH_C3[4] * x * (4.0 * zz - xx - yy),
            _SH_C3[5] * z * (xx - yy),
            _SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    if degree > 4:
        comps += [
            _SH_C4[0] * xy * (xx - yy),
            _SH_C4[1] * yz * (3.0 * xx - yy),
            _SH_C4[2] * xy * (7.0 * zz - 1.0),
            _SH_C4[3] * yz * (7.0 * zz - 3.0),
            _SH_C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            _SH_C4[5] * xz * (7.0 * zz - 3.0),
            _SH_C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            _SH_C4[7] * xz * (xx - 3.0 * yy),
            _SH_C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(comps, axis=-1)
