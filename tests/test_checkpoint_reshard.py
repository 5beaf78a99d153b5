"""Resharded checkpoint restore: save from an 8-device mesh, restore on 1
and on a different mesh shape, continue training — the multi-host claim of
``checkpoints.py`` exercised on the virtual CPU mesh (SURVEY.md §5.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu import checkpoints, train
from torch_nerf_tpu.fields import make_nerf_field
from torch_nerf_tpu.parallel import make_mesh, make_sharded_train_step
from torch_nerf_tpu.parallel.mesh import replicate_state
from torch_nerf_tpu.renderer import RenderSettings

FIELD = make_nerf_field(coord_encode_level=2, dir_encode_level=1, feat_dim=32)
SETTINGS = RenderSettings(num_samples_coarse=8, num_samples_fine=8)
OPTIM = train.OptimConfig(num_iter=100, init_lr=1e-3, end_lr=1e-4)


def _ray_batch(n, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
    )


def test_save_on_8_mesh_restore_on_1_and_4(tmp_path):
    # train one step on the full 8-device DP mesh, save
    mesh8 = make_mesh(("data",))
    state = train.create_train_state(jax.random.PRNGKey(0), FIELD, SETTINGS, OPTIM)
    build, place = make_sharded_train_step(FIELD, SETTINGS, OPTIM, mesh8)
    sharded = place(state)
    step8 = build(sharded)
    o, d, gt = _ray_batch(64)
    sharded, _ = step8(sharded, o, d, gt, jax.random.PRNGKey(1))
    checkpoints.save_checkpoint(tmp_path, sharded)
    expect_leaves = jax.tree.leaves(jax.device_get(sharded.params))

    template = train.create_train_state(jax.random.PRNGKey(9), FIELD, SETTINGS, OPTIM)

    # restore single-device (host arrays) — exact params, training continues
    restored = checkpoints.restore_latest(tmp_path, template)
    assert restored is not None and int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(restored.params), expect_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    plain_step = jax.jit(train.make_ray_train_step(FIELD, SETTINGS, OPTIM))
    cont, metrics = plain_step(restored, o, d, gt, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"])) and int(cont.step) == 2

    # restore onto a DIFFERENT mesh (2x2 DP x TP) and keep training there
    mesh4 = make_mesh(("data", "model"), shape=(2, 2), devices=jax.devices()[:4])
    restored4 = replicate_state(mesh4, restored, model_axis="model")
    build4, _ = make_sharded_train_step(
        FIELD, SETTINGS, OPTIM, mesh4, model_axis="model"
    )
    step4 = build4(restored4)
    cont4, metrics4 = step4(restored4, o, d, gt, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics4["loss"])) and int(jax.device_get(cont4.step)) == 2
    # same data + same restored params => same loss as the single-device step
    np.testing.assert_allclose(
        float(metrics4["loss"]), float(metrics["loss"]), rtol=1e-5
    )
