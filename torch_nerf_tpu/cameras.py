"""Camera models and ray generation — pure JAX functions.

TPU-native re-design of the reference's camera stack
(``/root/reference/torch_nerf/src/renderer/cameras.py:10-193`` and
``src/renderer/ray_samplers/sampler_base.py:11-269``): instead of a stateful
``PerspectiveCamera`` object plus a sampler class, everything here is a pure,
shape-polymorphic ``jnp`` function that can live inside a single ``jit``.

Conventions (matched to the reference so renders are pixel-identical):

* Screen coordinates: pixel index ``p`` of a row-major ``(H, W)`` image maps
  to ``x = p % W`` and ``y = (H - 1) - p // W`` (the y-flip of
  ``volume_renderer.py:171-190``).
* Camera-frame ray directions: ``((x - cx) / fx, (y - cy) / fy, -1)`` with
  ``cx = W / 2`` and ``cy = H / 2`` — OpenGL-style, looking down ``-z``
  (``sampler_base.py:91-103``, ``cameras.py:109-117``). Directions are NOT
  normalized.
* World-frame: ``d_w = R @ d_c``, ``o_w = t`` where ``[R | t]`` is the
  camera-to-world extrinsic (``sampler_base.py:164-165``).
* NDC projection follows the official NeRF supplementary, applied to
  world-frame rays (``sampler_base.py:199-257``).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class CameraParams(NamedTuple):
    """Static pinhole camera description (all floats/ints, hashable).

    Mirrors the ``{f_x, f_y, img_width, img_height}`` dict form accepted by
    the reference (``cameras.py:66-84``).
    """

    focal_x: float
    focal_y: float
    img_width: int
    img_height: int

    @property
    def cx(self) -> float:
        return self.img_width / 2.0

    @property
    def cy(self) -> float:
        return self.img_height / 2.0

    def intrinsic_matrix(self) -> jnp.ndarray:
        """4x4 intrinsic matrix (rows 3/4 are dummies, as in the reference)."""
        return jnp.array(
            [
                [self.focal_x, 0.0, self.cx, 0.0],
                [0.0, self.focal_y, self.cy, 0.0],
                [0.0, 0.0, 0.0, 0.0],
                [0.0, 0.0, -1.0, 0.0],
            ],
            dtype=jnp.float32,
        )


def generate_screen_coords(img_height: int, img_width: int) -> jnp.ndarray:
    """Screen-space (x, y) coordinates for every pixel, y-flipped.

    Returns ``(H * W, 2)`` float32; row-major pixel ``p`` has
    ``x = p % W``, ``y = (H-1) - p // W``. Matches
    ``volume_renderer.py:171-190``.
    """
    ys = jnp.arange(img_height, dtype=jnp.float32)
    xs = jnp.arange(img_width, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    grid_y = (img_height - 1) - grid_y
    return jnp.stack([grid_x, grid_y], axis=-1).reshape(img_height * img_width, 2)


def screen_coords_from_indices(
    pixel_indices: jnp.ndarray, img_height: int, img_width: int
) -> jnp.ndarray:
    """Screen (x, y) for a batch of flat pixel indices — gather-free.

    Equivalent to ``generate_screen_coords(H, W)[pixel_indices]`` but computed
    arithmetically so it fuses into the surrounding jit (no (H*W, 2) table).
    """
    pixel_indices = pixel_indices.astype(jnp.int32)
    x = (pixel_indices % img_width).astype(jnp.float32)
    y = ((img_height - 1) - pixel_indices // img_width).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1)


def camera_ray_directions(
    screen_coords: jnp.ndarray, camera: CameraParams, normalize: bool = False
) -> jnp.ndarray:
    """Camera-frame ray directions for screen coords ``(N, 2)`` -> ``(N, 3)``.

    ``(u, v) -> ((u - cx) / fx, (v - cy) / fy, -1)`` per
    ``sampler_base.py:91-103``. ``normalize=False`` matches the reference's
    ``generate_rays`` call site.
    """
    x = (screen_coords[:, 0] - camera.cx) / camera.focal_x
    y = (screen_coords[:, 1] - camera.cy) / camera.focal_y
    d = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    if normalize:
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d


def rays_from_screen(
    screen_coords: jnp.ndarray,
    camera: CameraParams,
    extrinsic: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-frame rays (origins, directions) for screen coords.

    ``extrinsic`` is the 4x4 (or 3x4) camera-to-world matrix. Matches
    ``sampler_base.py:134-197`` (origins are the camera position; directions
    are un-normalized).
    """
    d_cam = camera_ray_directions(screen_coords, camera, normalize=False)
    rot = extrinsic[:3, :3]
    trans = extrinsic[:3, 3]
    d_world = d_cam @ rot.T
    o_world = jnp.broadcast_to(trans, d_world.shape)
    return o_world, d_world


def ndc_rays(
    ray_origin: jnp.ndarray,
    ray_dir: jnp.ndarray,
    focal: float,
    z_near: float,
    img_height: int,
    img_width: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project world-frame rays into NDC for forward-facing scenes.

    Implements the official-NeRF NDC mapping applied to world-frame rays,
    matching ``sampler_base.py:199-257`` exactly (including operating on the
    raw origins rather than pre-shifting them to the near plane).
    """
    ox, oy, oz = ray_origin[:, 0], ray_origin[:, 1], ray_origin[:, 2]
    dx, dy, dz = ray_dir[:, 0], ray_dir[:, 1], ray_dir[:, 2]

    sx = -(2.0 * focal / img_width)
    sy = -(2.0 * focal / img_height)

    o0 = sx * (ox / oz)
    o1 = sy * (oy / oz)
    o2 = 1.0 + (2.0 * z_near / oz)

    d0 = sx * ((dx / dz) - (ox / oz))
    d1 = sy * ((dy / dz) - (oy / oz))
    d2 = -(2.0 * z_near / oz)

    projected_origin = jnp.stack([o0, o1, o2], axis=-1)
    projected_dir = jnp.stack([d0, d1, d2], axis=-1)
    return projected_origin, projected_dir


def rays_for_pixels(
    pixel_indices: jnp.ndarray,
    camera: CameraParams,
    extrinsic: jnp.ndarray,
    use_ndc: bool = False,
    ndc_z_near: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """End-to-end: flat pixel indices -> world (or NDC) rays.

    The all-in-one path used inside the jitted train/render steps. The NDC
    branch requires ``focal_x == focal_y`` (asserted by the reference at
    ``sampler_base.py:168-176``); we use ``focal_x``.
    """
    coords = screen_coords_from_indices(pixel_indices, camera.img_height, camera.img_width)
    o, d = rays_from_screen(coords, camera, extrinsic)
    if use_ndc:
        o, d = ndc_rays(o, d, camera.focal_x, ndc_z_near, camera.img_height, camera.img_width)
    return o, d
