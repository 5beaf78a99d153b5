"""Unit tests for positional and spherical-harmonics encoders.

Checks closed-form values and the exact output layout of the reference
encoders (positional_encoder.py:71-104, spherical_harmonics_encoder.py:98-137).
"""

import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu import encoders


def test_positional_encoding_dim():
    assert encoders.positional_encoding_dim(3, 10, True) == 63
    assert encoders.positional_encoding_dim(3, 4, True) == 27
    assert encoders.positional_encoding_dim(3, 10, False) == 60


def test_positional_encoding_layout_and_values():
    x = jnp.array([[0.1, -0.2, 0.3]])
    L = 4
    enc = np.asarray(encoders.positional_encoding(x, L, include_input=True))
    assert enc.shape == (1, 27)

    # layout: [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...]
    np.testing.assert_allclose(enc[0, :3], np.array([0.1, -0.2, 0.3]), rtol=1e-6)
    xv = np.array([0.1, -0.2, 0.3])
    for level in range(L):
        freq = 2.0**level
        start = 3 + level * 6
        np.testing.assert_allclose(enc[0, start : start + 3], np.sin(freq * xv), rtol=1e-5)
        np.testing.assert_allclose(
            enc[0, start + 3 : start + 6], np.cos(freq * xv), rtol=1e-5
        )


def test_positional_encoding_no_pi_factor():
    # the official-NeRF variant drops pi: sin(1 * x), not sin(pi * x)
    x = jnp.array([[1.0, 0.0, 0.0]])
    enc = np.asarray(encoders.positional_encoding(x, 1, include_input=False))
    np.testing.assert_allclose(enc[0, 0], np.sin(1.0), rtol=1e-6)


def test_sh_encoding_degree4():
    rng = np.random.default_rng(0)
    d = rng.normal(size=(16, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    enc = np.asarray(encoders.sh_encoding(jnp.asarray(d), degree=4))
    assert enc.shape == (16, 16)

    x, y, z = d[:, 0], d[:, 1], d[:, 2]
    # spot-check several components against the reference formulas
    np.testing.assert_allclose(enc[:, 0], 0.28209479177387814 * np.ones(16), rtol=1e-6)
    np.testing.assert_allclose(enc[:, 1], -0.4886025119029199 * y, rtol=1e-5)
    np.testing.assert_allclose(enc[:, 2], 0.4886025119029199 * z, rtol=1e-5)
    np.testing.assert_allclose(enc[:, 3], -0.4886025119029199 * x, rtol=1e-5)
    np.testing.assert_allclose(enc[:, 4], 1.0925484305920792 * x * y, rtol=1e-5)
    np.testing.assert_allclose(
        enc[:, 6], 0.31539156525252005 * (2 * z * z - x * x - y * y), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        enc[:, 9], -0.5900435899266435 * y * (3 * x * x - y * y), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        enc[:, 15], -0.5900435899266435 * x * (x * x - 3 * y * y), rtol=1e-4, atol=1e-6
    )


def test_sh_encoding_dim():
    assert encoders.sh_encoding_dim(4) == 16
    d = jnp.ones((4, 3))
    assert encoders.sh_encoding(d, 2).shape == (4, 4)
    assert encoders.sh_encoding(d, 5).shape == (4, 25)
