"""Sharded-training tests on the 8-device virtual CPU mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu import train
from torch_nerf_tpu.fields import make_nerf_field
from torch_nerf_tpu.parallel import make_mesh, make_sharded_train_step
from torch_nerf_tpu.renderer import RenderSettings

FIELD = make_nerf_field(coord_encode_level=2, dir_encode_level=1, feat_dim=32)
SETTINGS = RenderSettings(num_samples_coarse=8, num_samples_fine=8)
OPTIM = train.OptimConfig(num_iter=100, init_lr=1e-3, end_lr=1e-4)


def _ray_batch(n):
    rng = np.random.default_rng(0)
    o = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    gt = rng.uniform(size=(n, 3)).astype(np.float32)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(gt)


def test_virtual_mesh_has_8_devices():
    assert jax.device_count() >= 8


def test_dp_sharded_step_matches_single_device():
    state = train.create_train_state(jax.random.PRNGKey(0), FIELD, SETTINGS, OPTIM)
    o, d, gt = _ray_batch(64)
    key = jax.random.PRNGKey(1)

    # single-device result
    plain_step = train.make_ray_train_step(FIELD, SETTINGS, OPTIM)
    ref_state, ref_metrics = jax.jit(plain_step)(state, o, d, gt, key)

    # 8-way data-parallel result
    mesh = make_mesh(("data",))
    build, place_state = make_sharded_train_step(FIELD, SETTINGS, OPTIM, mesh)
    sharded = place_state(state)
    step = build(sharded)
    new_state, metrics = step(sharded, o, d, gt, key)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    for name in ["fc_in", "fc_8"]:
        np.testing.assert_allclose(
            np.asarray(new_state.params["coarse"][name]["w"]),
            np.asarray(ref_state.params["coarse"][name]["w"]),
            rtol=1e-4,
            atol=1e-6,
        )


def test_dp_tp_mesh_step_runs():
    mesh = make_mesh(("data", "model"), shape=(4, 2))
    state = train.create_train_state(jax.random.PRNGKey(0), FIELD, SETTINGS, OPTIM)
    build, place_state = make_sharded_train_step(
        FIELD, SETTINGS, OPTIM, mesh, model_axis="model"
    )
    sharded = place_state(state)
    step = build(sharded)
    o, d, gt = _ray_batch(32)
    new_state, metrics = step(sharded, o, d, gt, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1

    # TP params must actually be sharded over the model axis
    w = new_state.params["coarse"]["fc_in"]["w"]
    assert w.sharding.spec == jax.sharding.PartitionSpec(None, "model")


def test_dp_image_step_matches_single_device():
    """Sharded image-level step == plain image step (same keys, same math)."""
    from torch_nerf_tpu.cameras import CameraParams
    from torch_nerf_tpu.parallel import make_sharded_image_train_step

    h = w = 16
    camera = CameraParams(focal_x=20.0, focal_y=20.0, img_width=w, img_height=h)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(size=(2, h * w, 3)).astype(np.float32))
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = 4.0
    poses = jnp.asarray(np.stack([pose, pose]))

    state = train.create_train_state(jax.random.PRNGKey(0), FIELD, SETTINGS, OPTIM)
    key = jax.random.PRNGKey(5)

    plain = train.make_image_train_step(
        FIELD, SETTINGS, OPTIM, camera, num_pixels=64, donate=False
    )
    _, ref_metrics = plain(state, images, poses, key)

    mesh = make_mesh(("data",))
    build, place_state = make_sharded_image_train_step(
        FIELD, SETTINGS, OPTIM, camera, mesh, num_pixels=64
    )
    sharded = place_state(state)
    new_state, metrics = build(sharded)(sharded, images, poses, key)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    assert int(new_state.step) == 1


def test_sample_sharded_composite_matches_unsharded():
    """Sample-axis (SP) compositing == plain composite (SURVEY.md §5.7)."""
    from torch_nerf_tpu.ops import integration, sampling
    from torch_nerf_tpu.parallel import make_sample_sharded_composite

    rng = np.random.default_rng(3)
    n, s = 16, 64  # s sharded 8 ways -> 8 samples per device
    sigma = jnp.asarray(rng.uniform(0, 3, size=(n, s)).astype(np.float32))
    radiance = jnp.asarray(rng.uniform(size=(n, s, 3)).astype(np.float32))
    t = jnp.sort(jnp.asarray(rng.uniform(2, 6, size=(n, s)).astype(np.float32)), axis=-1)
    delta = sampling.t_deltas(t)

    ref_rgb, ref_w = integration.composite(sigma, radiance, delta)

    mesh = make_mesh(("samples",))
    sharded_composite = make_sample_sharded_composite(mesh, "samples")
    rgb, w = sharded_composite(sigma, radiance, delta)

    np.testing.assert_allclose(np.asarray(rgb), np.asarray(ref_rgb), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_w), rtol=1e-5, atol=1e-6)


def test_tp_matches_replicated_numerics():
    mesh = make_mesh(("data", "model"), shape=(4, 2))
    state = train.create_train_state(jax.random.PRNGKey(0), FIELD, SETTINGS, OPTIM)
    o, d, gt = _ray_batch(32)
    key = jax.random.PRNGKey(2)

    plain_step = train.make_ray_train_step(FIELD, SETTINGS, OPTIM)
    _, ref_metrics = jax.jit(plain_step)(state, o, d, gt, key)

    build, place_state = make_sharded_train_step(
        FIELD, SETTINGS, OPTIM, mesh, model_axis="model"
    )
    sharded = place_state(state)
    _, metrics = build(sharded)(sharded, o, d, gt, key)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )


def test_sharded_render_matches_single_device():
    """Full-image render sharded over 8 devices == 1-device render."""
    import numpy as np
    from torch_nerf_tpu import train
    from torch_nerf_tpu.cameras import CameraParams
    from torch_nerf_tpu.fields import make_nerf_field
    from torch_nerf_tpu.parallel import make_mesh, make_sharded_render
    from torch_nerf_tpu.renderer import RenderSettings

    field = make_nerf_field(coord_encode_level=3, dir_encode_level=2, feat_dim=32)
    settings = RenderSettings(num_samples_coarse=8, num_samples_fine=8)
    optim = train.OptimConfig(num_iter=10)
    state = train.create_train_state(jax.random.PRNGKey(0), field, settings, optim)
    camera = CameraParams(focal_x=20.0, focal_y=20.0, img_width=16, img_height=12)
    pose = jnp.eye(4)
    key = jax.random.PRNGKey(7)

    render8 = make_sharded_render(field, settings, make_mesh(("data",)), camera)
    render1 = make_sharded_render(
        field, settings, make_mesh(("data",), devices=jax.devices()[:1]), camera
    )
    img8 = render8(state.params["coarse"], state.params["fine"], pose, key)
    img1 = render1(state.params["coarse"], state.params["fine"], pose, key)
    assert img8.shape == (12, 16, 3)
    np.testing.assert_allclose(np.asarray(img8), np.asarray(img1), rtol=2e-5, atol=2e-5)


def test_fused_dp_sharded_step_matches_single_device():
    """The shard_map fused-kernel DP path (interpret mode) must reproduce the
    single-device fused step: RNG is drawn globally outside the shard region,
    so numerics match up to pmean reduction order."""
    fused_field = make_nerf_field(
        coord_encode_level=2,
        dir_encode_level=1,
        feat_dim=32,
        use_pallas=True,
        pallas_interpret=True,
    )
    state = train.create_train_state(jax.random.PRNGKey(0), fused_field, SETTINGS, OPTIM)
    o, d, gt = _ray_batch(64)
    key = jax.random.PRNGKey(1)

    plain_step = train.make_ray_train_step(fused_field, SETTINGS, OPTIM)
    ref_state, ref_metrics = plain_step(state, o, d, gt, key)

    mesh = make_mesh(("data",))
    build, place_state = make_sharded_train_step(fused_field, SETTINGS, OPTIM, mesh)
    sharded_state = place_state(state)
    step = build(sharded_state)
    new_state, metrics = step(sharded_state, o, d, gt, key)

    np.testing.assert_allclose(metrics["loss"], ref_metrics["loss"], rtol=1e-5)
    for a, b in zip(
        jax.tree.leaves(new_state.params), jax.tree.leaves(ref_state.params)
    ):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_sharded_step_hlo_contains_gradient_allreduce():
    """Collective-placement evidence for the scaling claim (SURVEY.md §5.8):
    the compiled DP train step must contain cross-replica all-reduces (the
    XLA lowering of the gradient psum/pmean over the data axis). Real
    multi-host ICI cannot be measured in this environment; asserting the
    collectives exist in the compiled HLO pins the machinery."""
    state = train.create_train_state(jax.random.PRNGKey(0), FIELD, SETTINGS, OPTIM)
    mesh = make_mesh(("data",))
    build, place = make_sharded_train_step(FIELD, SETTINGS, OPTIM, mesh)
    sharded = place(state)
    o, d, gt = _ray_batch(64)

    # build() returns a jitted fn; lower+compile without executing
    step = build(sharded)
    compiled = step.lower(sharded, o, d, gt, jax.random.PRNGKey(1)).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo, "no cross-replica all-reduce in compiled DP step"

    # fused shard_map path: the pmean lowers to all-reduces too
    fused_field = make_nerf_field(
        coord_encode_level=2, dir_encode_level=1, feat_dim=32,
        use_pallas=True, pallas_interpret=True,
    )
    fstate = train.create_train_state(jax.random.PRNGKey(0), fused_field, SETTINGS, OPTIM)
    fbuild, fplace = make_sharded_train_step(fused_field, SETTINGS, OPTIM, mesh)
    fsharded = fplace(fstate)
    fstep = fbuild(fsharded)
    fhlo = fstep.lower(fsharded, o, d, gt, jax.random.PRNGKey(1)).compile().as_text()
    assert "all-reduce" in fhlo, "no all-reduce in compiled fused shard_map step"
