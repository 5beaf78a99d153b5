"""Fused Pallas NeRF kernel vs the jnp reference path (interpreter mode).

Checks forward outputs and the full custom-VJP gradient chain (params, pts,
dirs) for exact math equivalence in float32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_nerf_tpu.fields import make_nerf_field
from torch_nerf_tpu.ops.pallas.fused_nerf import FusedNeRFConfig, fused_nerf_apply

L_POS, L_DIR, FEAT = 4, 2, 64

JNP_FIELD = make_nerf_field(
    coord_encode_level=L_POS, dir_encode_level=L_DIR, feat_dim=FEAT
)
PALLAS_FIELD = make_nerf_field(
    coord_encode_level=L_POS,
    dir_encode_level=L_DIR,
    feat_dim=FEAT,
    use_pallas=True,
    pallas_interpret=True,
)
CFG = FusedNeRFConfig(
    coord_encode_level=L_POS,
    dir_encode_level=L_DIR,
    feat_dim=FEAT,
    tile=64,
    compute_dtype=jnp.float32,
    interpret=True,
)


def _data(n=96, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    return pts, dirs


def test_forward_matches_jnp_path():
    params = JNP_FIELD.init(jax.random.PRNGKey(0))
    pts, dirs = _data(128)  # exact multiple of tile

    sigma_ref, rgb_ref = JNP_FIELD.apply(params, pts, dirs)
    sigma, rgb = fused_nerf_apply(params, pts, dirs, CFG)

    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), rtol=1e-5, atol=1e-6)


def test_forward_handles_non_tile_multiple():
    params = JNP_FIELD.init(jax.random.PRNGKey(1))
    pts, dirs = _data(100)  # 100 % 64 != 0 -> padding path
    sigma_ref, rgb_ref = JNP_FIELD.apply(params, pts, dirs)
    sigma, rgb = fused_nerf_apply(params, pts, dirs, CFG)
    assert sigma.shape == (100,)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), rtol=1e-5, atol=1e-6)


def test_gradients_match_jnp_path():
    params = JNP_FIELD.init(jax.random.PRNGKey(2))
    pts, dirs = _data(128, seed=3)

    def loss_ref(p, pts, dirs):
        s, r = JNP_FIELD.apply(p, pts, dirs)
        return jnp.mean(r) + 0.01 * jnp.mean(s * s)

    def loss_pallas(p, pts, dirs):
        s, r = fused_nerf_apply(p, pts, dirs, CFG)
        return jnp.mean(r) + 0.01 * jnp.mean(s * s)

    gp_ref, gpts_ref, gdirs_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(params, pts, dirs)
    gp, gpts, gdirs = jax.grad(loss_pallas, argnums=(0, 1, 2))(params, pts, dirs)

    for name in gp_ref:
        np.testing.assert_allclose(
            np.asarray(gp[name]["w"]),
            np.asarray(gp_ref[name]["w"]),
            rtol=1e-4,
            atol=1e-6,
            err_msg=f"dW mismatch in {name}",
        )
        np.testing.assert_allclose(
            np.asarray(gp[name]["b"]),
            np.asarray(gp_ref[name]["b"]),
            rtol=1e-4,
            atol=1e-6,
            err_msg=f"db mismatch in {name}",
        )
    np.testing.assert_allclose(np.asarray(gpts), np.asarray(gpts_ref), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gdirs), np.asarray(gdirs_ref), rtol=1e-4, atol=1e-6)


def test_gradient_accumulates_across_tiles():
    """Param grads must sum over multiple grid steps (tile=64, n=192)."""
    params = JNP_FIELD.init(jax.random.PRNGKey(4))
    pts, dirs = _data(192, seed=5)

    def loss(p):
        s, r = fused_nerf_apply(p, pts, dirs, CFG)
        return jnp.mean(r) + 0.01 * jnp.mean(s)

    def loss_ref(p):
        s, r = JNP_FIELD.apply(p, pts, dirs)
        return jnp.mean(r) + 0.01 * jnp.mean(s)

    g = jax.grad(loss)(params)
    g_ref = jax.grad(loss_ref)(params)
    np.testing.assert_allclose(
        np.asarray(g["fc_in"]["w"]), np.asarray(g_ref["fc_in"]["w"]), rtol=1e-4, atol=1e-6
    )


def test_pallas_field_end_to_end_render():
    """The pallas field plugs into render_rays and matches the jnp field."""
    from torch_nerf_tpu.renderer import RenderSettings, render_rays

    params = JNP_FIELD.init(jax.random.PRNGKey(6))
    rng = np.random.default_rng(7)
    o = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    settings = RenderSettings(num_samples_coarse=8, num_samples_fine=8)
    key = jax.random.PRNGKey(8)

    out_ref = render_rays(JNP_FIELD, params, params, o, d, key, settings)
    out = render_rays(PALLAS_FIELD, params, params, o, d, key, settings)
    np.testing.assert_allclose(
        np.asarray(out["rgb_fine"]), np.asarray(out_ref["rgb_fine"]), rtol=1e-4, atol=1e-5
    )
