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


# ---------------------------------------------------------------------------
# fractional-cycle polynomial trig (the bf16 compute path's encode)


def test_poly_trig_encode_matches_exact_below_bf16_resolution():
    """_encode_poly (bf16 path) vs _encode_fast at the PRODUCTION encoder
    (L=10 coords, inputs spanning +-8 — phase up to ~650 cycles at the top
    frequency). Fit + fixed-point-phase error must stay ~an order of
    magnitude under the 2^-8 bf16 quantum the MLP consumes."""
    from torch_nerf_tpu.ops.pallas.fused_nerf import (
        _encode_fast,
        _encode_poly,
        _encode_tables,
    )

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-8, 8, size=(512, 3)).astype(np.float32))
    exact_t = [jnp.asarray(t) for t in _encode_tables(10, True)]
    poly_t = [jnp.asarray(t) for t in _encode_tables(10, True, fast_trig=True)]

    enc_ref, spread_ref = _encode_fast(x, exact_t, jnp.float32)
    enc, spread = _encode_poly(x, poly_t, jnp.float32)
    np.testing.assert_allclose(np.asarray(spread), np.asarray(spread_ref), rtol=0, atol=0)
    err = np.abs(np.asarray(enc) - np.asarray(enc_ref)).max()
    assert err < 4e-4, f"poly encode error {err} vs bf16 quantum 3.9e-3"


def test_poly_trig_bwd_matches_exact():
    from torch_nerf_tpu.ops.pallas.fused_nerf import (
        _encode_fast_bwd,
        _encode_poly,
        _encode_poly_bwd,
        _encode_tables,
    )

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.uniform(-8, 8, size=(256, 3)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(256, 63)).astype(np.float32))
    exact_t = [jnp.asarray(t) for t in _encode_tables(10, True)]
    poly_t = [jnp.asarray(t) for t in _encode_tables(10, True, fast_trig=True)]

    _, spread = _encode_poly(x, poly_t, jnp.float32)
    dx_ref = np.asarray(_encode_fast_bwd(spread, g, exact_t))
    dx = np.asarray(_encode_poly_bwd(spread, g, poly_t))
    # derivative error ~ freq * cos-poly error (4e-5) summed over 63 columns
    scale = np.abs(dx_ref).max()
    np.testing.assert_allclose(dx, dx_ref, rtol=0, atol=2e-3 * max(scale, 1.0))


def test_bf16_interpret_kernel_uses_poly_and_stays_close():
    """End-to-end: the bf16 fused kernel (which routes through _encode_poly)
    in interpret mode vs the f32 exact kernel — agreement at bf16 level,
    proving the poly tables/wiring are consistent end to end."""
    cfg16 = FusedNeRFConfig(
        coord_encode_level=L_POS,
        dir_encode_level=L_DIR,
        feat_dim=FEAT,
        tile=64,
        compute_dtype=jnp.bfloat16,
        interpret=True,
    )
    params = JNP_FIELD.init(jax.random.PRNGKey(13))
    pts, dirs = _data(n=96, seed=14)
    sigma16, rgb16 = fused_nerf_apply(params, pts, dirs, cfg16)
    sigma32, rgb32 = fused_nerf_apply(params, pts, dirs, CFG)
    np.testing.assert_allclose(
        np.asarray(rgb16), np.asarray(rgb32), rtol=0, atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(sigma16), np.asarray(sigma32), rtol=0.08, atol=0.25
    )
