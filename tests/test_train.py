"""End-to-end training tests: overfit a tiny analytic scene on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu import cameras, train
from torch_nerf_tpu.datasets import synthetic
from torch_nerf_tpu.fields import make_nerf_field
from torch_nerf_tpu.renderer import RenderSettings, render_image


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return -10.0 * np.log10(mse + 1e-12)


def test_overfit_tiny_scene_loss_falls_and_psnr_rises():
    images, poses, camera, scene = synthetic.make_dataset(num_views=4, img_size=32)
    settings = RenderSettings(
        num_samples_coarse=24, num_samples_fine=0, t_near=2.0, t_far=6.0
    )
    field = make_nerf_field(coord_encode_level=4, dir_encode_level=2, feat_dim=64)
    optim = train.OptimConfig(num_iter=400, init_lr=5e-3, end_lr=5e-4)

    state = train.create_train_state(jax.random.PRNGKey(0), field, settings, optim)
    step = train.make_image_train_step(
        field, settings, optim, camera, num_pixels=256, donate=False
    )

    images_j = jnp.asarray(images)
    poses_j = jnp.asarray(poses)

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(400):
        key, sub = jax.random.split(key)
        state, metrics = step(state, images_j, poses_j, sub)
        losses.append(float(metrics["loss"]))

    first = np.mean(losses[:20])
    last = np.mean(losses[-20:])
    assert last < first * 0.25, f"loss did not fall: {first} -> {last}"

    # rendered view should resemble ground truth
    img = render_image(
        field,
        state.params["coarse"],
        None,
        camera,
        poses_j[0],
        jax.random.PRNGKey(2),
        settings,
        chunk_size=256,
    )
    gt = images[0].reshape(32, 32, 3)
    psnr = _psnr(np.clip(np.asarray(img), 0, 1), gt)
    assert psnr > 18.0, f"PSNR too low after overfit: {psnr:.2f} dB"


def test_hierarchical_train_step_runs_and_improves():
    images, poses, camera, _ = synthetic.make_dataset(num_views=2, img_size=16)
    settings = RenderSettings(num_samples_coarse=12, num_samples_fine=12)
    field = make_nerf_field(coord_encode_level=2, dir_encode_level=1, feat_dim=32)
    optim = train.OptimConfig(num_iter=100, init_lr=5e-3, end_lr=1e-3)

    state = train.create_train_state(jax.random.PRNGKey(0), field, settings, optim)
    step = train.make_image_train_step(
        field, settings, optim, camera, num_pixels=64, donate=False
    )
    images_j, poses_j = jnp.asarray(images), jnp.asarray(poses)

    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(100):
        key, sub = jax.random.split(key)
        state, metrics = step(state, images_j, poses_j, sub)
        losses.append(float(metrics["loss"]))
        assert "fine_loss" in metrics and "coarse_loss" in metrics

    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    assert int(state.step) == 100


def test_precrop_step_samples_center_pixels_only():
    h = w = 16
    camera = cameras.CameraParams(focal_x=20.0, focal_y=20.0, img_width=w, img_height=h)
    crop = train.precrop_pixel_indices(h, w)
    rows, cols = crop // w, crop % w
    ci, cj = (h - 1) // 2, (w - 1) // 2
    assert rows.min() == ci - ci // 2 and rows.max() == ci + ci // 2 - 1
    assert cols.min() == cj - cj // 2 and cols.max() == cj + cj // 2 - 1


def test_sample_pixels_without_replacement_distinct():
    idx = np.asarray(
        train.sample_pixels_without_replacement(jax.random.PRNGKey(0), 1000, 256)
    )
    assert len(np.unique(idx)) == 256
    assert idx.min() >= 0 and idx.max() < 1000


def test_lr_schedule_matches_exponential_decay():
    cfg = train.OptimConfig(num_iter=1000, init_lr=5e-4, end_lr=5e-5)
    sched = train.lr_schedule(cfg)
    assert np.isclose(float(sched(0)), 5e-4)
    assert np.isclose(float(sched(1000)), 5e-5, rtol=1e-3)
    assert np.isclose(float(sched(500)), np.sqrt(5e-4 * 5e-5), rtol=1e-3)


def test_scene_field_container_queries_active_primitive():
    """Scene aggregate: init covers all primitives, apply hits the active one."""
    import numpy as np
    from torch_nerf_tpu.fields import make_nerf_field, make_scene_field

    a = make_nerf_field(coord_encode_level=2, dir_encode_level=1, feat_dim=16)
    b = make_nerf_field(coord_encode_level=3, dir_encode_level=1, feat_dim=16)
    scene = make_scene_field({"cube_a": a, "cube_b": b}, active="cube_b")

    params = scene.init(jax.random.PRNGKey(0))
    assert set(params) == {"cube_a", "cube_b"}

    pts = jnp.asarray(np.random.default_rng(0).normal(size=(4, 2, 3)), jnp.float32)
    dirs = jnp.asarray(np.random.default_rng(1).normal(size=(4, 2, 3)), jnp.float32)
    sigma, rgb = scene.apply(params, pts, dirs)
    s_b, r_b = b.apply(params["cube_b"], pts, dirs)
    np.testing.assert_array_equal(np.asarray(sigma), np.asarray(s_b))
    np.testing.assert_array_equal(np.asarray(rgb), np.asarray(r_b))


def test_table_weight_decay_touches_only_tables():
    """L2-through-Adam table decay: with zero gradients, decayed table
    params must shrink while MLP params stay (train.make_optimizer)."""
    import optax

    from torch_nerf_tpu import train

    params = {
        "coarse": {
            "tables": jnp.ones((2, 4, 8)),
            "density_mlp": {"fc_in": {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}},
        }
    }
    cfg = train.OptimConfig(num_iter=100, init_lr=1e-2, end_lr=1e-2, table_weight_decay=0.1)
    opt = train.make_optimizer(cfg)
    state = opt.init(params)
    zero_grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = opt.update(zero_grads, state, params)
    new = optax.apply_updates(params, updates)
    assert float(jnp.max(jnp.abs(new["coarse"]["tables"]))) < 1.0
    np.testing.assert_array_equal(
        np.asarray(new["coarse"]["density_mlp"]["fc_in"]["w"]), np.ones((4, 4))
    )
