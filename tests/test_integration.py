"""Unit tests for the quadrature compositor."""

import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu.ops import integration


def test_two_sample_hand_computed():
    sigma = jnp.array([[1.0, 2.0]])
    delta = jnp.array([[0.5, 0.25]])
    rgb_in = jnp.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])

    rgb, w = integration.composite(sigma, rgb_in, delta)
    rgb, w = np.asarray(rgb), np.asarray(w)

    # T_1 = 1; alpha_1 = 1 - e^{-0.5}
    # T_2 = e^{-0.5}; alpha_2 = 1 - e^{-0.5}
    a1 = 1 - np.exp(-0.5)
    w1 = 1.0 * a1
    w2 = np.exp(-0.5) * (1 - np.exp(-0.5))
    np.testing.assert_allclose(w[0], [w1, w2], rtol=1e-5)
    np.testing.assert_allclose(rgb[0], [w1, w2, 0.0], rtol=1e-5, atol=1e-7)


def test_weights_bounded_and_sum_below_one():
    rng = np.random.default_rng(0)
    sigma = jnp.asarray(rng.uniform(0, 5, size=(64, 32)).astype(np.float32))
    delta = jnp.asarray(rng.uniform(0.01, 0.2, size=(64, 32)).astype(np.float32))
    rgb_in = jnp.asarray(rng.uniform(size=(64, 32, 3)).astype(np.float32))
    rgb, w = integration.composite(sigma, rgb_in, delta)
    w = np.asarray(w)
    assert np.all(w >= 0)
    assert np.all(w.sum(-1) <= 1.0 + 1e-5)
    assert np.all(np.asarray(rgb) >= 0)


def test_opaque_first_sample_dominates():
    sigma = jnp.array([[1000.0, 1000.0]])
    delta = jnp.array([[1.0, 1.0]])
    rgb_in = jnp.array([[[0.3, 0.6, 0.9], [1.0, 1.0, 1.0]]])
    rgb, w = integration.composite(sigma, rgb_in, delta)
    np.testing.assert_allclose(np.asarray(rgb)[0], [0.3, 0.6, 0.9], atol=1e-5)
    np.testing.assert_allclose(np.asarray(w)[0], [1.0, 0.0], atol=1e-5)


def test_zero_density_renders_black():
    sigma = jnp.zeros((4, 8))
    delta = jnp.ones((4, 8))
    rgb_in = jnp.ones((4, 8, 3))
    rgb, w = integration.composite(sigma, rgb_in, delta)
    np.testing.assert_allclose(np.asarray(rgb), 0.0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-7)
