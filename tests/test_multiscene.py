"""Multi-scene batched training (``torch_nerf_tpu.multiscene``).

The scene axis is exact vmap over independent per-scene pipelines: the
stacked step must reproduce N separate single-scene steps bit-for-bit
(given the per-scene fold_in keys), shard over a mesh with no collectives,
and drive end-to-end through the train CLI with per-scene PSNR.
"""

import jax
import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu import multiscene, train
from torch_nerf_tpu.datasets import synthetic
from torch_nerf_tpu.fields import make_nerf_field
from torch_nerf_tpu.renderer import RenderSettings

FIELD = make_nerf_field(coord_encode_level=2, dir_encode_level=1, feat_dim=32)
SETTINGS = RenderSettings(num_samples_coarse=8, num_samples_fine=8, t_near=2.0, t_far=6.0)
OPTIM = train.OptimConfig(num_iter=100)


def _scene_data(num_scenes=2, img=16, views=2):
    imgs, poses = [], []
    for s in range(num_scenes):
        i, p, camera, _ = synthetic.make_dataset(
            num_views=views, img_size=img,
            scene=synthetic.GaussianBlobScene.random(100 + s),
        )
        imgs.append(i)
        poses.append(p)
    return jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(poses)), camera


def test_random_scenes_are_distinct_and_deterministic():
    a = synthetic.GaussianBlobScene.random(1)
    b = synthetic.GaussianBlobScene.random(2)
    assert a != b
    assert a == synthetic.GaussianBlobScene.random(1)


def test_multiscene_step_matches_independent_single_scene_steps():
    """The stacked step == per-scene make_image_train_step with the same
    fold_in(key, s) — the scene axis is pure vmap, no cross-scene coupling."""
    images, poses, camera = _scene_data()
    num_scenes = images.shape[0]
    state = multiscene.create_multiscene_state(
        jax.random.PRNGKey(0), FIELD, SETTINGS, OPTIM, num_scenes
    )
    step = multiscene.make_multiscene_image_train_step(
        FIELD, SETTINGS, OPTIM, camera, num_scenes, num_pixels=32, donate=False
    )
    key = jax.random.PRNGKey(7)
    new_state, metrics = step(state, images, poses, key)
    assert metrics["coarse_loss"].shape == (num_scenes,)

    single = train.make_image_train_step(
        FIELD, SETTINGS, OPTIM, camera, num_pixels=32, donate=False
    )
    for s in range(num_scenes):
        ref_state = train.TrainState(
            step=state.step,
            params=multiscene.scene_params(state, s),
            opt_state=jax.tree.map(lambda x: x[s], state.opt_state),
        )
        ref_new, ref_metrics = single(
            ref_state, images[s], poses[s], jax.random.fold_in(key, s)
        )
        np.testing.assert_allclose(
            float(metrics["coarse_loss"][s]), float(ref_metrics["coarse_loss"]),
            rtol=1e-6,
        )
        for a, b in zip(
            jax.tree.leaves(multiscene.scene_params(new_state, s)),
            jax.tree.leaves(ref_new.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            )


def test_multiscene_sharded_matches_and_has_no_collectives():
    """8 scenes over the 8-device mesh: numerics equal the unsharded step and
    the compiled HLO carries NO all-reduce (scenes share nothing)."""
    from torch_nerf_tpu.parallel import make_mesh

    images, poses, camera = _scene_data(num_scenes=8)
    state = multiscene.create_multiscene_state(
        jax.random.PRNGKey(0), FIELD, SETTINGS, OPTIM, 8
    )
    plain_step = multiscene.make_multiscene_image_train_step(
        FIELD, SETTINGS, OPTIM, camera, 8, num_pixels=32, donate=False
    )
    key = jax.random.PRNGKey(3)
    ref_state, ref_metrics = plain_step(state, images, poses, key)

    mesh = make_mesh(("scene",))
    build, place_state = multiscene.make_multiscene_image_train_step(
        FIELD, SETTINGS, OPTIM, camera, 8, num_pixels=32, donate=False, mesh=mesh,
    )
    sharded = place_state(state)
    step = build(sharded)
    hlo = step.lower(sharded, images, poses, key).compile().as_text()
    # the training pipeline itself must not communicate (scenes share
    # nothing); the only permitted collective is the scalar metric mean
    import re

    for line in hlo.splitlines():
        if "all-reduce" in line and "f32[]" not in line:
            shapes = re.findall(r"f32\[([0-9,]*)\]", line)
            sizes = [int(np.prod([int(d) for d in s.split(",") if d])) for s in shapes]
            assert max(sizes, default=0) <= 8, f"large collective in HLO: {line[:200]}"

    new_state, metrics = step(sharded, images, poses, key)
    np.testing.assert_allclose(
        np.asarray(metrics["coarse_loss"]), np.asarray(ref_metrics["coarse_loss"]),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree.leaves(new_state.params), jax.tree.leaves(ref_state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_multiscene_cli_reports_per_scene_psnr(tmp_path, capsys):
    """4-scene run through the real train CLI: per-scene PSNR in one
    invocation, checkpoint written, resume works."""
    from torch_nerf_tpu.runners import run_train

    overrides = [
        "data.dataset_type=gaussian_blobs",
        "data.num_scenes=4",
        "data.img_size=16",
        "data.num_views=2",
        "data.half_res=false",
        "network.feat_dim=32",
        "signal_encoder.coord_encode_level=4",
        "signal_encoder.dir_encode_level=2",
        "renderer.num_pixels=64",
        "renderer.num_samples_coarse=8",
        "renderer.num_samples_fine=8",
        "train_params.optim.num_iter=8",
        "train_params.validation.validate_every=4",
        "train_params.log.epoch_btw_ckpt=4",
    ]
    log_dir = tmp_path / "ms_run"
    run_train.main(
        ["--config", "default", "--log-dir", str(log_dir), "--max-steps", "8"]
        + overrides
    )
    out = capsys.readouterr().out
    assert "psnr_scene0" in out and "psnr_scene3" in out
    assert list((log_dir / "ckpt").iterdir())

    run_train.main(
        ["--config", "default", "--log-dir", str(log_dir), "--max-steps", "8"]
        + overrides
    )
    out = capsys.readouterr().out
    assert "Resumed from step 8" in out


def test_shardmap_step_matches_vmap_path():
    """The UNBATCHED shard_map builder (scenes 1:1 over a 2-device mesh,
    Pallas-compatible per-scene bodies) reproduces the vmap builder — both
    draw per-scene streams from fold_in(key, global_scene)."""
    from torch_nerf_tpu.parallel import make_mesh

    images, poses, camera = _scene_data(num_scenes=2)
    state = multiscene.create_multiscene_state(
        jax.random.PRNGKey(0), FIELD, SETTINGS, OPTIM, 2
    )
    key = jax.random.PRNGKey(11)
    vstep = multiscene.make_multiscene_image_train_step(
        FIELD, SETTINGS, OPTIM, camera, 2, num_pixels=32, donate=False
    )
    ref_state, ref_metrics = vstep(state, images, poses, key)

    mesh = make_mesh(("scene",), devices=jax.devices()[:2])
    build, place_state = multiscene.make_multiscene_shardmap_step(
        FIELD, SETTINGS, OPTIM, camera, 2, mesh, num_pixels=32, donate=False
    )
    st = place_state(state)
    step = build(st)
    new_state, metrics = step(st, images, poses, key)

    np.testing.assert_allclose(
        np.asarray(metrics["coarse_loss"]),
        np.asarray(ref_metrics["coarse_loss"]),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree.leaves(new_state.params), jax.tree.leaves(ref_state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_shardmap_step_multiple_scenes_per_device():
    """4 scenes over 2 devices: the per-device lax.map over its scene pair
    still matches the vmap builder."""
    from torch_nerf_tpu.parallel import make_mesh

    images, poses, camera = _scene_data(num_scenes=4)
    state = multiscene.create_multiscene_state(
        jax.random.PRNGKey(0), FIELD, SETTINGS, OPTIM, 4
    )
    key = jax.random.PRNGKey(13)
    vstep = multiscene.make_multiscene_image_train_step(
        FIELD, SETTINGS, OPTIM, camera, 4, num_pixels=32, donate=False
    )
    _, ref_metrics = vstep(state, images, poses, key)

    mesh = make_mesh(("scene",), devices=jax.devices()[:2])
    build, place_state = multiscene.make_multiscene_shardmap_step(
        FIELD, SETTINGS, OPTIM, camera, 4, mesh, num_pixels=32, donate=False
    )
    st = place_state(state)
    _, metrics = build(st)(st, images, poses, key)
    np.testing.assert_allclose(
        np.asarray(metrics["coarse_loss"]),
        np.asarray(ref_metrics["coarse_loss"]),
        rtol=1e-5,
    )


def test_shardmap_ngp_multiscene_on_virtual_mesh():
    """The NGP field trains multi-scene through the shard_map path (the vmap
    path can't batch its kernels) — per-scene losses drop over a few steps."""
    from torch_nerf_tpu.fields_ngp import make_instant_ngp_field
    from torch_nerf_tpu.parallel import make_mesh

    field = make_instant_ngp_field(
        num_level=2, log_max_entry_per_level=8, table_feat_dim=2,
        min_res=4, max_res=8,
    )
    settings = RenderSettings(
        num_samples_coarse=16, num_samples_fine=0, t_near=2.0, t_far=6.0
    )
    optim = train.OptimConfig(num_iter=100, init_lr=1e-2, end_lr=1e-3, eps=1e-15)
    images, poses, camera = _scene_data(num_scenes=2)
    state = multiscene.create_multiscene_state(
        jax.random.PRNGKey(0), field, settings, optim, 2
    )
    mesh = make_mesh(("scene",), devices=jax.devices()[:2])
    build, place_state = multiscene.make_multiscene_shardmap_step(
        field, settings, optim, camera, 2, mesh, num_pixels=64, donate=False
    )
    st = place_state(state)
    step = build(st)
    key = jax.random.PRNGKey(5)
    first = None
    for i in range(10):
        key, sub = jax.random.split(key)
        st, metrics = step(st, images, poses, sub)
        if first is None:
            first = float(metrics["loss"])
    assert metrics["coarse_loss"].shape == (2,)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < first


def _write_blender_scene(root, name, seed, n_views=2, size=16):
    """Tiny Blender-format scene with train/val/test splits on disk."""
    import json

    from PIL import Image

    scene_dir = root / name
    rng = np.random.default_rng(seed)
    for split in ("train", "val", "test"):
        split_dir = scene_dir / split
        split_dir.mkdir(parents=True)
        frames = []
        for i in range(n_views):
            img = rng.integers(0, 255, size=(size, size, 4), dtype=np.uint8)
            img[..., 3] = 255
            Image.fromarray(img, "RGBA").save(split_dir / f"r_{i}.png")
            pose = np.eye(4)
            pose[2, 3] = 4.0 + i + {"train": 0, "val": 0.25, "test": 0.5}[split]
            frames.append(
                {"file_path": f"./{split}/r_{i}", "transform_matrix": pose.tolist()}
            )
        meta = {"camera_angle_x": 0.6911112070083618, "frames": frames}
        (scene_dir / f"transforms_{split}.json").write_text(json.dumps(meta))


def test_multiscene_blender_train_render_evaluate_roundtrip(tmp_path, capsys):
    """BASELINE configs[3]: N stacked Blender-format scenes batched in one
    run, then per-scene render (--scene) + evaluate — the reference's
    render contract extended to multiscene checkpoints."""
    from torch_nerf_tpu.runners import evaluate as evaluate_cli
    from torch_nerf_tpu.runners import run_render, run_train

    data_root = tmp_path / "blender"
    data_root.mkdir()
    _write_blender_scene(data_root, "alpha", seed=1)
    _write_blender_scene(data_root, "beta", seed=2)

    overrides = [
        "data.dataset_type=nerf_synthetic",
        f"data.data_root={data_root}",
        "data.scene_name=alpha,beta",
        "data.num_scenes=2",
        "data.half_res=false",
        "network.feat_dim=32",
        "signal_encoder.coord_encode_level=4",
        "signal_encoder.dir_encode_level=2",
        "renderer.num_pixels=64",
        "renderer.num_samples_coarse=8",
        "renderer.num_samples_fine=8",
        "train_params.optim.num_iter=4",
        "train_params.validation.validate_every=2",
        "train_params.log.epoch_btw_ckpt=2",
    ]
    log_dir = tmp_path / "ms_blender"
    run_train.main(
        ["--config", "default", "--log-dir", str(log_dir), "--max-steps", "4"]
        + overrides
    )
    out = capsys.readouterr().out
    assert "psnr_scene0" in out and "psnr_scene1" in out

    render_dir = tmp_path / "render_scene1"
    run_render.main(
        [
            "--log-dir", str(log_dir),
            "--scene", "1",
            "--render-test-views",
            "--num-views", "1",
            "--out-dir", str(render_dir),
        ]
    )
    out = capsys.readouterr().out
    assert "Loaded scene 1 of a 2-scene checkpoint" in out
    assert (render_dir / "0000.png").exists()

    # evaluate scene 1's render against scene 1's own test ground truth
    from torch_nerf_tpu import config as cfg_mod, session
    from torch_nerf_tpu.logging_utils import save_png

    cfg = cfg_mod.load_config(log_dir / "config.yaml")
    ds = session.build_multiscene_dataset(cfg, 1, split="test")
    gt_dir = tmp_path / "gt_scene1"
    gt_dir.mkdir()
    save_png(gt_dir / "0000.png", ds.images[0])
    evaluate_cli.main([str(render_dir), str(gt_dir)])
    out = capsys.readouterr().out
    assert "PSNR:" in out and "SSIM:" in out

    # out-of-range scene ids fail loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        run_render.main(["--log-dir", str(log_dir), "--scene", "5"])
