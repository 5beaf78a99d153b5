"""Dataset loader tests using generated on-disk fixtures (no downloads)."""

import json

import numpy as np
import pytest
from PIL import Image

from torch_nerf_tpu.datasets import blender, llff, synthetic


# ---------------------------------------------------------------------------
# Blender fixture


@pytest.fixture
def blender_scene(tmp_path):
    scene_dir = tmp_path / "lego"
    scene_dir.mkdir()
    train_dir = scene_dir / "train"
    train_dir.mkdir()

    rng = np.random.default_rng(0)
    frames = []
    for i in range(3):
        img = rng.integers(0, 255, size=(16, 16, 4), dtype=np.uint8)
        img[:4, :4, 3] = 0  # transparent corner to test white compositing
        Image.fromarray(img, "RGBA").save(train_dir / f"r_{i}.png")
        pose = np.eye(4)
        pose[2, 3] = 4.0 + i
        frames.append(
            {"file_path": f"./train/r_{i}", "transform_matrix": pose.tolist()}
        )
    meta = {"camera_angle_x": 0.6911112070083618, "frames": frames}
    (scene_dir / "transforms_train.json").write_text(json.dumps(meta))
    return tmp_path


def test_blender_loader_full_res(blender_scene):
    data = blender.load_blender(blender_scene, "lego", "train", half_res=False)
    assert data.images.shape == (3, 16, 16, 3)
    assert data.poses.shape == (3, 4, 4)
    assert data.render_poses.shape == (40, 4, 4)
    # white background where alpha was 0
    np.testing.assert_allclose(data.images[0, 0, 0], [1.0, 1.0, 1.0])
    # focal from camera_angle_x
    expected_focal = 0.5 * 16 / np.tan(0.5 * 0.6911112070083618)
    assert np.isclose(data.camera.focal_x, expected_focal, rtol=1e-5)


def test_blender_loader_half_res(blender_scene):
    data = blender.load_blender(blender_scene, "lego", "train", half_res=True)
    assert data.images.shape == (3, 8, 8, 3)
    assert data.camera.img_width == 8
    full = blender.load_blender(blender_scene, "lego", "train", half_res=False)
    assert np.isclose(data.camera.focal_x, full.camera.focal_x / 2.0)


def test_blender_rejects_unknown_scene(blender_scene):
    with pytest.raises(ValueError):
        blender.load_blender(blender_scene, "spaceship", "train")


# ---------------------------------------------------------------------------
# LLFF fixture


@pytest.fixture
def llff_scene(tmp_path):
    scene_dir = tmp_path / "fern"
    img_dir = scene_dir / "images"
    img_dir.mkdir(parents=True)

    rng = np.random.default_rng(1)
    n_views, h, w, focal = 5, 32, 40, 50.0
    rows = []
    for i in range(n_views):
        img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(img, "RGB").save(img_dir / f"img_{i:03d}.png")
        # LLFF convention: columns [down, right, back, position, hwf].
        # Vary orientations slightly (i > 0) so spherify's least-squares
        # center problem is well-conditioned; keep view 0 exactly identity
        # for the axis-fix test.
        c2w = np.eye(4)[:3]
        if i > 0:
            angle = 0.08 * i
            rot_y = np.array(
                [
                    [np.cos(angle), 0.0, np.sin(angle)],
                    [0.0, 1.0, 0.0],
                    [-np.sin(angle), 0.0, np.cos(angle)],
                ]
            )
            angle_x = 0.05 * i
            rot_x = np.array(
                [
                    [1.0, 0.0, 0.0],
                    [0.0, np.cos(angle_x), -np.sin(angle_x)],
                    [0.0, np.sin(angle_x), np.cos(angle_x)],
                ]
            )
            c2w[:3, :3] = rot_y @ rot_x
        c2w[0, 3] = 0.1 * i
        c2w[2, 3] = 0.05 * i
        # build the raw LLFF 3x5 matrix: invert the axis fix
        # ref fix: new = [old_col1, -old_col0, old_col2(back), t]
        # so old_col0 = -new_col1, old_col1 = new_col0
        rot_right, rot_up, rot_back = c2w[:, 0], c2w[:, 1], c2w[:, 2]
        raw = np.stack([-rot_up, rot_right, rot_back, c2w[:, 3]], axis=1)
        hwf = np.array([[h], [w], [focal]])
        mat = np.concatenate([raw, hwf], axis=1)  # (3, 5)
        rows.append(np.concatenate([mat.reshape(-1), [2.0, 10.0]]))
    np.save(scene_dir / "poses_bounds.npy", np.stack(rows))
    return tmp_path


def test_llff_loader_basic(llff_scene):
    data = llff.load_llff(llff_scene, "fern", factor=2, bd_factor=0.75)
    assert data.images.shape == (5, 16, 20, 3)
    assert data.poses.shape == (5, 4, 4)
    assert data.render_poses.shape == (120, 4, 4)
    assert data.z_bounds.shape == (5, 2)
    # bd rescale: min bound * bd_factor -> 1 / 0.75
    assert np.isclose(data.z_bounds.min() * 0.75, 1.0, rtol=1e-5)
    # focal scaled by factor
    assert np.isclose(data.camera.focal_x, 50.0 / 2.0, rtol=1e-5)


def test_llff_axis_fix_identity_case(llff_scene):
    data = llff.load_llff(
        llff_scene, "fern", factor=1, recenter=False, bd_factor=None
    )
    # fixture built so the fixed pose should be identity rotation
    np.testing.assert_allclose(data.poses[0, :3, :3], np.eye(3), atol=1e-6)


def test_llff_recenter_moves_mean_to_origin(llff_scene):
    data = llff.load_llff(llff_scene, "fern", factor=1, recenter=True, bd_factor=None)
    mean_pos = data.poses[:, :3, 3].mean(0)
    np.testing.assert_allclose(mean_pos, 0.0, atol=1e-5)


def test_llff_spherify(llff_scene):
    data = llff.load_llff(llff_scene, "fern", factor=2, spherify=True)
    assert data.render_poses.shape == (120, 4, 4)
    # spherified positions lie near the unit sphere
    radii = np.linalg.norm(data.poses[:, :3, 3], axis=-1)
    assert np.isclose(np.sqrt(np.mean(radii**2)), 1.0, rtol=1e-4)


def test_llff_t_bounds():
    z = np.array([[2.0, 10.0], [3.0, 8.0]], dtype=np.float32)
    assert llff.llff_t_bounds(z, project_to_ndc=True) == (0.0, 1.0)
    near, far = llff.llff_t_bounds(z, project_to_ndc=False)
    assert np.isclose(near, 1.8) and np.isclose(far, 10.0)


def test_llff_holdout_index(llff_scene):
    data = llff.load_llff(llff_scene, "fern", factor=1, bd_factor=None)
    idx = llff.llff_holdout_index(data.poses)
    assert 0 <= idx < 5


# ---------------------------------------------------------------------------
# synthetic scene


def test_synthetic_dataset_shapes():
    images, poses, camera, scene = synthetic.make_dataset(num_views=3, img_size=16)
    assert images.shape == (3, 256, 3)
    assert poses.shape == (3, 4, 4)
    assert camera.img_height == 16
    assert np.all(images >= 0) and np.all(images <= 1.0 + 1e-5)
    # the scene is visible: images are not all black
    assert images.mean() > 0.01


def test_orbit_poses_match_reference_pose_spherical():
    # reference pose_spherical(0, -30, 4): camera above-front, looking at origin
    pose = synthetic.pose_spherical(0.0, -30.0, 4.0)
    pos = pose[:3, 3]
    assert np.isclose(np.linalg.norm(pos), 4.0, rtol=1e-5)
    # theta=0 -> camera on the -y...z arc (x=0 after the flip matrix)
    assert abs(pos[0]) < 1e-5


def test_synthetic_splits_are_disjoint_novel_views():
    """val/test poses must differ from train poses (real held-out views)."""
    train = synthetic.split_poses(4, "train")
    val = synthetic.split_poses(4, "val")
    test = synthetic.split_poses(4, "test")
    for a, b in [(train, val), (train, test), (val, test)]:
        dists = np.linalg.norm(a[:, None, :3, 3] - b[None, :, :3, 3], axis=-1)
        assert dists.min() > 0.05, "splits share a camera position"


def test_session_val_split_full_resolution():
    """Validation data is the val split at FULL resolution, mirroring the
    reference's half_res=False val loading (runners/train.py:67-68)."""
    from torch_nerf_tpu import config as cfg_mod, session

    cfg = cfg_mod.ExperimentConfig()
    cfg.data.dataset_type = "gaussian_blobs"
    cfg.data.img_size = 16
    cfg.data.num_views = 2
    cfg.data.half_res = True

    train_ds = session.build_dataset(cfg, split="train")
    val_ds = session.build_dataset(cfg, split="val")
    assert train_ds.camera.img_height == 16
    assert val_ds.camera.img_height == 32  # full res = 2x the half-res train
    # genuinely novel views
    dists = np.linalg.norm(
        train_ds.poses[:, None, :3, 3] - val_ds.poses[None, :, :3, 3], axis=-1
    )
    assert dists.min() > 0.05


def test_session_llff_holdout_split(llff_scene):
    """LLFF: train excludes the holdout view; val/test contain exactly it
    (load_llff.py:561-565)."""
    from torch_nerf_tpu import config as cfg_mod, session

    cfg = cfg_mod.ExperimentConfig()
    cfg.data.dataset_type = "nerf_llff"
    cfg.data.data_root = str(llff_scene)
    cfg.data.scene_name = "fern"
    cfg.data.factor = 1

    full = llff.load_llff(llff_scene, "fern", factor=1)
    holdout = llff.llff_holdout_index(full.poses)

    train_ds = session.build_dataset(cfg, split="train")
    test_ds = session.build_dataset(cfg, split="test")
    assert train_ds.num_views == full.num_views - 1
    assert test_ds.num_views == 1
    np.testing.assert_allclose(test_ds.poses[0], full.poses[holdout])
    for pose in train_ds.poses:
        assert not np.allclose(pose, full.poses[holdout])
