"""Unit tests for stratified + hierarchical (inverse-CDF) sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu.ops import sampling


def test_t_bins():
    bins, size = sampling.t_bins(2.0, 6.0, 4)
    np.testing.assert_allclose(np.asarray(bins), [2.0, 3.0, 4.0, 5.0], rtol=1e-6)
    assert np.isclose(size, 1.0)


def test_stratified_samples_within_bins():
    key = jax.random.PRNGKey(0)
    t = np.asarray(sampling.stratified_t_samples(key, 128, 2.0, 6.0, 16))
    assert t.shape == (128, 16)
    bins, size = sampling.t_bins(2.0, 6.0, 16)
    bins = np.asarray(bins)
    assert np.all(t >= bins[None, :])
    assert np.all(t < bins[None, :] + size + 1e-6)
    # strictly increasing along each ray (one sample per bin)
    assert np.all(np.diff(t, axis=-1) > 0)


def test_sample_pdf_concentrates_mass():
    key = jax.random.PRNGKey(1)
    n_rays, n_coarse, n_fine = 64, 16, 256
    bins, size = sampling.t_bins(0.0, 1.0, n_coarse)
    bins = jnp.broadcast_to(bins[None, :], (n_rays, n_coarse))
    # all weight on bin 5
    weights = jnp.zeros((n_rays, n_coarse)).at[:, 5].set(1.0)
    t = np.asarray(sampling.sample_pdf(key, bins, size, weights, n_fine))
    assert t.shape == (n_rays, n_fine)
    lo, hi = 5 * size, 6 * size
    frac_in_bin = np.mean((t >= lo) & (t < hi))
    # 1e-5 regularizer leaks a little mass; the vast majority must land in bin 5
    assert frac_in_bin > 0.95


def test_sample_pdf_uniform_weights_roughly_uniform():
    key = jax.random.PRNGKey(2)
    n_rays, n_coarse, n_fine = 8, 8, 4096
    bins, size = sampling.t_bins(0.0, 1.0, n_coarse)
    bins = jnp.broadcast_to(bins[None, :], (n_rays, n_coarse))
    weights = jnp.ones((n_rays, n_coarse))
    t = np.asarray(sampling.sample_pdf(key, bins, size, weights, n_fine)).reshape(-1)
    hist, _ = np.histogram(t, bins=n_coarse, range=(0.0, 1.0))
    assert hist.min() > 0.8 * hist.mean()


def test_hierarchical_sorted_and_in_range():
    key = jax.random.PRNGKey(3)
    weights = jax.random.uniform(jax.random.PRNGKey(4), (32, 16))
    t = np.asarray(
        sampling.hierarchical_t_samples(key, weights, 2.0, 6.0, 16, 32)
    )
    assert t.shape == (32, 48)
    assert np.all(np.diff(t, axis=-1) >= 0)
    assert np.all(t >= 2.0) and np.all(t <= 6.0 + 1e-5)


def test_t_deltas_sentinel():
    t = jnp.array([[1.0, 2.0, 4.0]])
    d = np.asarray(sampling.t_deltas(t))
    np.testing.assert_allclose(d[0, :2], [1.0, 2.0], rtol=1e-6)
    assert d[0, 2] > 1e7


def test_points_along_rays():
    o = jnp.array([[1.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 1.0, 0.0]])
    t = jnp.array([[0.5, 2.0]])
    pts = np.asarray(sampling.points_along_rays(o, d, t))
    np.testing.assert_allclose(pts[0, 0], [1.0, 0.5, 0.0], rtol=1e-6)
    np.testing.assert_allclose(pts[0, 1], [1.0, 2.0, 0.0], rtol=1e-6)


def test_sample_pdf_matches_searchsorted_semantics():
    """Our compare-and-count bin lookup must equal searchsorted(right)-1."""
    key = jax.random.PRNGKey(5)
    n_rays, n_coarse = 16, 32
    weights = jax.random.uniform(jax.random.PRNGKey(6), (n_rays, n_coarse)) ** 3

    w = np.asarray(weights) + 1e-5
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((n_rays, 1)), np.cumsum(pdf, -1)[:, :-1]], -1)

    u_key, _ = jax.random.split(key)
    u = np.asarray(jax.random.uniform(u_key, (n_rays, 64)))

    idx_ref = np.stack(
        [np.searchsorted(cdf[i], u[i], side="right") - 1 for i in range(n_rays)]
    )
    le = (cdf[:, None, :] <= u[:, :, None]).astype(np.int32)
    idx_ours = np.clip(le.sum(-1) - 1, 0, n_coarse - 1)
    np.testing.assert_array_equal(idx_ours, idx_ref)
