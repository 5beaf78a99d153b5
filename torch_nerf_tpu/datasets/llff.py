"""LLFF (forward-facing) dataset loader.

Re-implements the behavior of the reference's LLFF pipeline
(``/root/reference/torch_nerf/src/utils/data/load_llff.py:17-570`` and
``llff_dataset.py:13-134``) in clean numpy:

* ``poses_bounds.npy`` parsing: N rows of 17 floats = a 3x5 matrix
  ([R | t | (H, W, f)]) plus (near, far) depth bounds;
* the LLFF->NeRF axis-convention fix (columns [down, right, back] ->
  [right, up, back], see https://github.com/bmild/nerf/issues/34);
* bd_factor rescale of translations and bounds so min depth ~ 1/bd_factor;
* recentering of all poses about the dataset's average pose;
* optional spherification for 360 captures + circular render path;
* spiral novel-view render path for forward-facing captures;
* holdout view = pose closest to the average pose.

Image minification: the reference shells out to ImageMagick ``mogrify``
(``load_llff.py:17-85``); here we downsample with exact area pooling in
numpy when a pre-minified ``images_{factor}/`` directory is absent, so no
external binary is required (and results are cached to the same directory
layout the reference expects).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from torch_nerf_tpu.cameras import CameraParams
from torch_nerf_tpu.datasets.blender import PosedImages, _imread

LLFF_SCENES = ("fern", "flower", "fortress", "horns", "leaves", "orchids", "room", "trex")

_IMG_EXTS = (".jpg", ".JPG", ".jpeg", ".png", ".PNG")


def _normalize(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v)


def _view_matrix(z_vec: np.ndarray, up: np.ndarray, position: np.ndarray) -> np.ndarray:
    """Camera-to-world 3x4 from forward (z), up hint, and position."""
    z = _normalize(z_vec)
    x = _normalize(np.cross(up, z))
    y = _normalize(np.cross(z, x))
    return np.stack([x, y, z, position], axis=1)


def average_pose(poses: np.ndarray) -> np.ndarray:
    """The 'central' camera pose of the capture -> (3, 4).

    Mean position; mean z-axis as forward; summed y-axes as the up hint
    (matching ``poses_avg``, ``load_llff.py:283-307``).
    """
    center = poses[:, :3, 3].mean(axis=0)
    z = _normalize(poses[:, :3, 2].sum(axis=0))
    up = poses[:, :3, 1].sum(axis=0)
    return _view_matrix(z, up, center)


def recenter_poses(poses: np.ndarray) -> np.ndarray:
    """Express all poses relative to the average pose (``load_llff.py:353-376``)."""
    avg = np.eye(4, dtype=poses.dtype)
    avg[:3, :4] = average_pose(poses)
    bottom = np.broadcast_to(
        np.array([0, 0, 0, 1], dtype=poses.dtype), (poses.shape[0], 1, 4)
    )
    homog = np.concatenate([poses[:, :3, :4], bottom], axis=1)
    recentered = np.linalg.inv(avg) @ homog
    out = poses.copy()
    out[:, :3, :4] = recentered[:, :3, :4]
    return out


def spiral_render_path(
    c2w: np.ndarray,
    up: np.ndarray,
    radii: np.ndarray,
    focus_depth: float,
    z_rate: float = 0.5,
    num_rotations: int = 2,
    num_keyframes: int = 120,
) -> np.ndarray:
    """Spiral of poses about the central camera (``load_llff.py:312-350``)."""
    render_poses = []
    radii4 = np.asarray(list(radii) + [1.0])
    for theta in np.linspace(0.0, 2.0 * np.pi * num_rotations, num_keyframes + 1)[:-1]:
        offsets = np.array(
            [np.cos(theta), -np.sin(theta), -np.sin(theta * z_rate), 1.0]
        ) * radii4
        position = c2w[:3, :4] @ offsets
        focus_point = c2w[:3, :4] @ np.array([0.0, 0.0, -focus_depth, 1.0])
        z_vec = _normalize(position - focus_point)
        render_poses.append(_view_matrix(z_vec, up, position))
    return np.stack(render_poses).astype(np.float32)


def spherify_poses(
    poses: np.ndarray, bounds: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Recenter 360 captures on the point closest to all camera axes and
    generate a circular render path (``load_llff.py:385-458``)."""
    rays_d = poses[:, :3, 2:3]
    rays_o = poses[:, :3, 3:4]

    # least-squares point minimizing distance to all camera z-axes
    eye = np.eye(3)
    a_i = eye - rays_d * rays_d.transpose(0, 2, 1)
    b_i = -a_i @ rays_o
    center = np.squeeze(
        -np.linalg.inv((a_i.transpose(0, 2, 1) @ a_i).mean(0)) @ b_i.mean(0)
    )

    up = (poses[:, :3, 3] - center).mean(0)
    vec0 = _normalize(up)
    vec1 = _normalize(np.cross(np.array([0.1, 0.2, 0.3]), vec0))
    vec2 = _normalize(np.cross(vec0, vec1))
    frame = np.stack([vec1, vec2, vec0, center], axis=1)  # (3, 4)

    frame44 = np.eye(4)
    frame44[:3, :4] = frame
    bottom = np.broadcast_to(np.array([0, 0, 0, 1.0]), (poses.shape[0], 1, 4))
    homog = np.concatenate([poses[:, :3, :4], bottom], axis=1)
    poses_reset = (np.linalg.inv(frame44) @ homog)[:, :3, :4]

    radius = np.sqrt(np.mean(np.sum(poses_reset[:, :3, 3] ** 2, axis=-1)))
    scale = 1.0 / radius
    poses_reset[:, :3, 3] *= scale
    bounds = bounds * scale
    radius *= scale

    centroid = poses_reset[:, :3, 3].mean(0)
    zh = centroid[2]
    circle_radius = np.sqrt(radius**2 - zh**2)

    new_poses = []
    for theta in np.linspace(0.0, 2.0 * np.pi, 120):
        position = np.array(
            [circle_radius * np.cos(theta), circle_radius * np.sin(theta), zh]
        )
        z_vec = _normalize(position)
        up_vec = np.array([0.0, 0.0, -1.0])
        x_vec = _normalize(np.cross(z_vec, up_vec))
        y_vec = _normalize(np.cross(z_vec, x_vec))
        new_poses.append(np.stack([x_vec, y_vec, z_vec, position], axis=1))
    render_poses = np.stack(new_poses).astype(np.float32)

    return poses_reset.astype(np.float32), render_poses, bounds.astype(np.float32)


def _area_downsample(img: np.ndarray, factor: int) -> np.ndarray:
    """Integer-factor area pooling (replaces the ImageMagick shell-out)."""
    h, w = img.shape[:2]
    h2, w2 = h // factor, w // factor
    img = img[: h2 * factor, : w2 * factor].astype(np.float32)
    return img.reshape(h2, factor, w2, factor, -1).mean(axis=(1, 3))


def _list_images(img_dir: Path):
    return sorted(p for p in img_dir.iterdir() if p.suffix in _IMG_EXTS)


def load_llff(
    data_root: str | Path,
    scene_name: str,
    factor: int = 8,
    recenter: bool = True,
    bd_factor: Optional[float] = 0.75,
    spherify: bool = False,
) -> PosedImages:
    """Load an LLFF scene -> PosedImages (+ z_bounds for t_near/t_far).

    Matches ``load_llff_data`` (``load_llff.py:461-570``): parse, axis-fix,
    rescale, recenter/spherify, spiral render path. The holdout-view index is
    computed separately by ``llff_holdout_index``; NDC/depth train bounds by
    ``llff_t_bounds``.
    """
    if scene_name not in LLFF_SCENES:
        raise ValueError(f"Unsupported scene '{scene_name}'. Expected one of {LLFF_SCENES}.")
    base = Path(data_root) / scene_name

    raw = np.load(base / "poses_bounds.npy")  # (N, 17)
    poses_raw = raw[:, :-2].reshape(-1, 3, 5)  # (N, 3, 5)
    bounds = raw[:, -2:].astype(np.float32)  # (N, 2)

    poses = poses_raw[:, :, :4].astype(np.float32)  # (N, 3, 4)
    hwf = poses_raw[:, :, 4].astype(np.float32)  # (N, 3): H, W, focal

    # LLFF [down, right, back] -> NeRF [right, up, back] column swap
    poses = np.concatenate(
        [poses[:, :, 1:2], -poses[:, :, 0:1], poses[:, :, 2:]], axis=2
    )

    # load (and if needed minify) images
    img_dir = base / "images"
    if factor and factor > 1:
        minified_dir = base / f"images_{factor}"
        # a cache with fewer images than the source is stale (e.g. a crash
        # mid-write before the atomic rename below existed): re-minify
        cache_ok = (
            minified_dir.exists()
            and len(_list_images(minified_dir)) == len(_list_images(img_dir))
        )
        if cache_ok:
            files = _list_images(minified_dir)
            images = np.stack(
                [_imread(f).astype(np.float32)[..., :3] / 255.0 for f in files]
            )
        else:
            files = _list_images(img_dir)
            minified = [
                _area_downsample(_imread(f)[..., :3], factor) for f in files
            ]
            # cache to the directory layout the reference's mogrify step
            # produces (load_llff.py:57-80) so subsequent loads skip the
            # downsample. Written to a temp dir and renamed atomically so a
            # crash mid-write never leaves a partial cache; best-effort —
            # read-only data roots just re-minify.
            try:
                import shutil  # noqa: PLC0415
                import tempfile  # noqa: PLC0415

                from torch_nerf_tpu.logging_utils import save_png  # noqa: PLC0415

                tmp_dir = Path(
                    tempfile.mkdtemp(prefix=f".images_{factor}.", dir=base)
                )
                for f, img in zip(files, minified):
                    save_png(tmp_dir / f"{f.stem}.png", img / 255.0)
                if minified_dir.exists():  # stale partial cache: replace it
                    shutil.rmtree(minified_dir)
                tmp_dir.rename(minified_dir)
            except OSError:
                pass
            images = np.stack(minified).astype(np.float32) / 255.0
    else:
        files = _list_images(img_dir)
        images = np.stack(
            [_imread(f).astype(np.float32)[..., :3] / 255.0 for f in files]
        )

    if images.shape[0] != poses.shape[0]:
        raise ValueError(
            f"Image/pose count mismatch: {images.shape[0]} vs {poses.shape[0]}."
        )

    # intrinsics reflect the minified resolution
    img_height, img_width = images.shape[1:3]
    focal = float(hwf[0, 2]) * (img_height / float(hwf[0, 0]))

    # rescale so the nearest depth ~ 1/bd_factor (load_llff.py:505-511)
    scale = 1.0 if bd_factor is None else 1.0 / (bounds.min() * bd_factor)
    poses[:, :3, 3] *= scale
    bounds = bounds * scale

    if recenter:
        poses = recenter_poses(poses)

    if spherify:
        poses, render_poses, bounds = spherify_poses(poses, bounds)
    else:
        avg = average_pose(poses)
        up = _normalize(poses[:, :3, 1].sum(0))
        close_depth, inf_depth = bounds.min() * 0.9, bounds.max() * 5.0
        dt = 0.75
        focus_depth = 1.0 / ((1.0 - dt) / close_depth + dt / inf_depth)
        radii = np.percentile(np.abs(poses[:, :3, 3]), 90, axis=0)
        render_poses = spiral_render_path(
            avg, up, radii, focus_depth, z_rate=0.5, num_rotations=2, num_keyframes=120
        )

    # pad 3x4 poses to 4x4 for the renderer
    def to44(p34: np.ndarray) -> np.ndarray:
        out = np.broadcast_to(np.eye(4, dtype=np.float32), (p34.shape[0], 4, 4)).copy()
        out[:, :3, :4] = p34[:, :3, :4]
        return out

    camera = CameraParams(
        focal_x=focal, focal_y=focal, img_width=int(img_width), img_height=int(img_height)
    )
    return PosedImages(
        images=np.ascontiguousarray(images.astype(np.float32)),
        poses=to44(poses),
        camera=camera,
        render_poses=to44(render_poses),
        image_names=[f.stem for f in files],
        z_bounds=bounds,
    )


def llff_holdout_index(poses: np.ndarray) -> int:
    """Index of the view closest to the average pose (``load_llff.py:561-565``)."""
    avg = average_pose(poses[:, :3, :4])
    dists = np.sum((avg[:3, 3] - poses[:, :3, 3]) ** 2, axis=-1)
    return int(np.argmin(dists))


def llff_t_bounds(z_bounds: np.ndarray, project_to_ndc: bool) -> Tuple[float, float]:
    """(t_near, t_far) per the reference's LLFF branch
    (``runner_utils.py:488-502``): (0, 1) under NDC, else z-bounds scaled by
    (0.9, 1.0)."""
    if project_to_ndc:
        return 0.0, 1.0
    return float(z_bounds.min() * 0.9), float(z_bounds.max() * 1.0)
