"""Blender 'nerf_synthetic' dataset loader.

Re-implements the reference loader semantics
(``/root/reference/torch_nerf/src/utils/data/load_blender.py:112-190`` and
``blender_dataset.py:13-122``) on numpy, producing device-ready flattened
arrays instead of a torch ``Dataset``/``DataLoader`` pair — the whole image
set is small enough to live in TPU HBM, so the training step gathers pixels
on-device and no per-step host IO exists.

Semantics preserved:
* ``transforms_{split}.json`` with ``camera_angle_x`` -> focal =
  ``0.5 * W / tan(0.5 * angle_x)``;
* RGBA images scaled to [0, 1]; white background composited where alpha == 0
  (the reference's hard mask, ``blender_dataset.py:99-102``, NOT alpha
  blending);
* ``half_res`` halves H/W/focal with area resampling;
* 40 spherical render poses (theta in [-180, 180), phi=-30, r=4).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from torch_nerf_tpu.cameras import CameraParams
from torch_nerf_tpu.datasets.synthetic import orbit_poses

BLENDER_SCENES = ("chair", "drums", "ficus", "hotdog", "lego", "materials", "mic", "ship")


@dataclasses.dataclass
class PosedImages:
    """A posed image set ready for training/eval.

    ``images``: (V, H, W, 3) float32 in [0, 1] (background already
    composited); ``poses``: (V, 4, 4) camera-to-world; ``camera``: shared
    intrinsics; ``render_poses``: (R, 4, 4) novel-view trajectory.
    """

    images: np.ndarray
    poses: np.ndarray
    camera: CameraParams
    render_poses: np.ndarray
    image_names: List[str]
    # LLFF-only: per-scene depth bounds (None for Blender)
    z_bounds: Optional[np.ndarray] = None

    @property
    def num_views(self) -> int:
        return self.images.shape[0]

    def flat_images(self) -> np.ndarray:
        """(V, H*W, 3) view for the on-device pixel pool."""
        v, h, w, c = self.images.shape
        return self.images.reshape(v, h * w, c)


def _imread(path: Path) -> np.ndarray:
    """Read an image file to (H, W, C) uint8/uint16 array.

    Prefers the native C++ PNG decoder (torch_nerf_tpu.native) when built,
    then PIL, then imageio.
    """
    try:
        from torch_nerf_tpu.native import png_decode  # noqa: PLC0415

        decoded = png_decode(path)
        if decoded is not None:
            return decoded
    except ImportError:
        pass
    try:
        from PIL import Image  # noqa: PLC0415

        return np.asarray(Image.open(path))
    except ImportError:
        import imageio.v2 as imageio  # noqa: PLC0415

        return np.asarray(imageio.imread(path))


def _area_downsample_half(img: np.ndarray) -> np.ndarray:
    """2x area downsample (equivalent to cv2.INTER_AREA at factor 2)."""
    h, w = img.shape[:2]
    h2, w2 = h // 2, w // 2
    img = img[: h2 * 2, : w2 * 2]
    return img.reshape(h2, 2, w2, 2, -1).mean(axis=(1, 3))


def load_blender(
    data_root: str | Path,
    scene_name: str,
    split: str = "train",
    half_res: bool = True,
    white_bg: bool = True,
    test_idx_skip: int = 1,
) -> PosedImages:
    """Load a Blender synthetic scene split.

    Mirrors ``load_blender_data`` + ``NeRFBlenderDataset.__getitem__``
    (including test-frame skipping for non-train splits).
    """
    if split not in ("train", "val", "test"):
        raise ValueError(f"Unsupported split '{split}'.")
    # canonical suite names load without existence pre-checks; any other
    # name is accepted when a Blender-format directory for it exists
    if (
        scene_name not in BLENDER_SCENES
        and not (Path(data_root) / scene_name / f"transforms_{split}.json").exists()
    ):
        raise ValueError(
            f"Unsupported scene '{scene_name}'. Expected one of "
            f"{BLENDER_SCENES} or a directory under {data_root} holding "
            f"transforms_{split}.json."
        )
    base = Path(data_root) / scene_name
    meta = json.loads((base / f"transforms_{split}.json").read_text())

    skip = 1 if (split == "train" or test_idx_skip == 0) else test_idx_skip
    frames = meta["frames"][::skip]

    images, poses, names = [], [], []
    for frame in frames:
        img_path = base / f"{frame['file_path']}.png"
        img = _imread(img_path).astype(np.float32) / 255.0
        images.append(img)
        poses.append(np.asarray(frame["transform_matrix"], dtype=np.float32))
        names.append(img_path.stem)
    imgs = np.stack(images)  # (V, H, W, 4)
    poses_arr = np.stack(poses)

    img_height, img_width = imgs.shape[1:3]
    camera_angle_x = float(meta["camera_angle_x"])
    focal = 0.5 * img_width / np.tan(0.5 * camera_angle_x)

    if half_res:
        img_height //= 2
        img_width //= 2
        focal /= 2.0
        imgs = np.stack([_area_downsample_half(im) for im in imgs])

    if imgs.shape[-1] == 4:
        if white_bg:
            alpha = imgs[..., -1]
            imgs = imgs.copy()
            imgs[alpha == 0.0, :] = 1.0  # hard white mask (blender_dataset.py:99-102)
        imgs = imgs[..., :3]

    camera = CameraParams(
        focal_x=float(focal),
        focal_y=float(focal),
        img_width=int(img_width),
        img_height=int(img_height),
    )
    render_poses = orbit_poses(40, phi_deg=-30.0, radius=4.0)

    return PosedImages(
        images=np.ascontiguousarray(imgs.astype(np.float32)),
        poses=poses_arr,
        camera=camera,
        render_poses=render_poses,
        image_names=names,
    )
