"""Fully-fused train kernel (ops.pallas.fused_train) vs the autodiff path.

The fused pass must reproduce, in float32 interpreter mode, exactly what
``jax.grad`` of ``train.ray_loss_fn`` computes on the jnp field: same
sampling (shared uniform draws), same composite, same coarse+fine MSE, same
parameter gradients. This pins the in-kernel closed-form composite/MSE VJP
(``fused_train._composite_tile``) against the reference math
(/root/reference/torch_nerf/src/renderer/integrators/quadrature_integrator.py:41-65).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_nerf_tpu import train
from torch_nerf_tpu.fields import make_nerf_field
from torch_nerf_tpu.renderer import RenderSettings

L_POS, L_DIR, FEAT = 4, 2, 64

JNP_FIELD = make_nerf_field(
    coord_encode_level=L_POS, dir_encode_level=L_DIR, feat_dim=FEAT
)
FUSED_FIELD = make_nerf_field(
    coord_encode_level=L_POS,
    dir_encode_level=L_DIR,
    feat_dim=FEAT,
    use_pallas=True,
    pallas_interpret=True,
)


def _ray_batch(n=12, seed=0):
    rng = np.random.default_rng(seed)
    ray_o = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    ray_d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    rgb_gt = jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32))
    return ray_o, ray_d, rgb_gt


@pytest.mark.parametrize("hierarchical", [False, True])
def test_fused_loss_and_grad_matches_autodiff(hierarchical):
    settings = RenderSettings(
        num_samples_coarse=8, num_samples_fine=8 if hierarchical else 0
    )
    params = {"coarse": JNP_FIELD.init(jax.random.PRNGKey(0))}
    if hierarchical:
        params["fine"] = JNP_FIELD.init(jax.random.PRNGKey(1))

    ray_o, ray_d, rgb_gt = _ray_batch()
    key = jax.random.PRNGKey(42)

    def loss_wrapper(p):
        return train.ray_loss_fn(JNP_FIELD, p, ray_o, ray_d, rgb_gt, key, settings)

    (_, ref_metrics), ref_grads = jax.value_and_grad(loss_wrapper, has_aux=True)(params)

    rand = train.draw_train_randomness(key, ray_o.shape[0], settings)
    metrics, grads = train.fused_loss_and_grad(
        FUSED_FIELD, params, ray_o, ray_d, rgb_gt, rand, settings
    )

    for name in ref_metrics:
        np.testing.assert_allclose(
            metrics[name], ref_metrics[name], rtol=1e-4, atol=1e-6, err_msg=name
        )
    for branch in ref_grads:
        for layer, lp in ref_grads[branch].items():
            for k in ("w", "b"):
                np.testing.assert_allclose(
                    grads[branch][layer][k],
                    lp[k],
                    rtol=2e-3,
                    atol=1e-6,
                    err_msg=f"{branch}/{layer}/{k}",
                )


def test_fused_ray_train_step_matches_generic():
    settings = RenderSettings(num_samples_coarse=8, num_samples_fine=8)
    optim = train.OptimConfig(num_iter=100, init_lr=1e-3, end_lr=1e-4)

    state0 = train.create_train_state(jax.random.PRNGKey(0), JNP_FIELD, settings, optim)
    ray_o, ray_d, rgb_gt = _ray_batch(seed=3)
    key = jax.random.PRNGKey(7)

    generic = train.make_ray_train_step(JNP_FIELD, settings, optim)
    fused = train.make_ray_train_step(FUSED_FIELD, settings, optim)

    s_ref, m_ref = generic(state0, ray_o, ray_d, rgb_gt, key)
    s_new, m_new = fused(state0, ray_o, ray_d, rgb_gt, key)

    np.testing.assert_allclose(m_new["loss"], m_ref["loss"], rtol=1e-4)
    ref_leaves = jax.tree.leaves(s_ref.params)
    new_leaves = jax.tree.leaves(s_new.params)
    for a, b in zip(new_leaves, ref_leaves):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-6)


def test_fused_pass_weights_match_renderer():
    """Per-ray weights from the fused pass drive hierarchical sampling; they
    must equal the renderer's composite weights for the same samples."""
    from torch_nerf_tpu.ops import integration, sampling
    from torch_nerf_tpu.ops.pallas.fused_train import fused_train_pass

    settings = RenderSettings(num_samples_coarse=8, num_samples_fine=0)
    params = JNP_FIELD.init(jax.random.PRNGKey(0))
    ray_o, ray_d, rgb_gt = _ray_batch(n=6, seed=5)

    t = sampling.stratified_t_samples(
        jax.random.PRNGKey(9), 6, settings.t_near, settings.t_far, 8
    )
    pts = sampling.points_along_rays(ray_o, ray_d, t)
    dirs = jnp.broadcast_to(ray_d[:, None, :], pts.shape)
    delta = sampling.t_deltas(t)

    sigma, radiance = JNP_FIELD.apply(params, pts, dirs)
    rgb_ref, w_ref = integration.composite(sigma, radiance, delta)

    rgb, w, _ = fused_train_pass(
        params, ray_o, ray_d, t, delta, rgb_gt, FUSED_FIELD.fused_cfg, 6
    )
    np.testing.assert_allclose(rgb, rgb_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(w, w_ref, rtol=1e-4, atol=1e-7)
