"""Procedural analytic scene — dataset-free ground truth for tests & benches.

The reference validates visually against downloaded Blender scenes; this
module instead defines an *analytic* emission-absorption field (a sum of
colored Gaussian density blobs) and renders ground-truth images with the
same quadrature rule the framework trains against. That gives exact,
reproducible train/val data with zero downloads — overfit tests can assert
rising PSNR against a closed-form scene, and benchmarks get realistic posed
image sets at any resolution.

Camera conventions match the Blender loader: OpenGL-style c2w poses orbiting
the origin, generated with the same spherical-pose math as
``/root/reference/torch_nerf/src/utils/data/load_blender.py:15-110``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu import cameras
from torch_nerf_tpu.ops import integration


@dataclasses.dataclass(frozen=True)
class GaussianBlobScene:
    """Analytic radiance field: K isotropic Gaussian density blobs.

    sigma(x) = sum_k amp_k * exp(-||x - mu_k||^2 / (2 s_k^2));
    radiance(x) is the density-weighted mix of per-blob colors (view
    independent — exact for testing the integrator and trainer).
    """

    centers: Tuple[Tuple[float, float, float], ...] = (
        (0.0, 0.0, 0.0),
        (0.6, 0.3, -0.2),
        (-0.5, -0.2, 0.4),
    )
    scales: Tuple[float, ...] = (0.45, 0.3, 0.25)
    amplitudes: Tuple[float, ...] = (8.0, 10.0, 10.0)
    colors: Tuple[Tuple[float, float, float], ...] = (
        (0.9, 0.2, 0.2),
        (0.2, 0.9, 0.3),
        (0.25, 0.35, 0.95),
    )

    @classmethod
    def random(cls, seed: int, num_blobs: int = 4) -> "GaussianBlobScene":
        """A randomized scene instance — the procedural stand-in for 'another
        Blender scene' in multi-scene batched training (every seed gives a
        distinct, deterministic arrangement of blobs)."""
        rng = np.random.default_rng(seed)
        centers = tuple(
            tuple(float(x) for x in rng.uniform(-0.8, 0.8, 3)) for _ in range(num_blobs)
        )
        scales = tuple(float(x) for x in rng.uniform(0.2, 0.5, num_blobs))
        amplitudes = tuple(float(x) for x in rng.uniform(6.0, 12.0, num_blobs))
        colors = []
        for _ in range(num_blobs):
            c = rng.uniform(0.1, 1.0, 3)
            c = c / c.max()  # keep one saturated channel per blob
            colors.append(tuple(float(x) for x in c))
        return cls(
            centers=centers, scales=scales, amplitudes=amplitudes, colors=tuple(colors)
        )

    def field(self, pts: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(sigma, rgb) of the analytic field at points (..., 3)."""
        mu = jnp.asarray(self.centers, jnp.float32)  # (K, 3)
        s = jnp.asarray(self.scales, jnp.float32)  # (K,)
        a = jnp.asarray(self.amplitudes, jnp.float32)  # (K,)
        c = jnp.asarray(self.colors, jnp.float32)  # (K, 3)

        d2 = jnp.sum((pts[..., None, :] - mu) ** 2, axis=-1)  # (..., K)
        per_blob = a * jnp.exp(-d2 / (2.0 * s**2))  # (..., K)
        sigma = jnp.sum(per_blob, axis=-1)
        weight = per_blob / (sigma[..., None] + 1e-8)
        rgb = jnp.einsum("...k,kc->...c", weight, c)
        return sigma, rgb


def pose_spherical(theta_deg: float, phi_deg: float, radius: float) -> np.ndarray:
    """Blender-style orbital camera-to-world pose (4, 4).

    Same composition as the reference's ``pose_spherical``
    (``load_blender.py:80-110``): translate along +z, rotate about x by phi,
    about y by theta, then the fixed axis-swap matrix.
    """
    trans = np.eye(4, dtype=np.float32)
    trans[2, 3] = radius

    phi = np.deg2rad(phi_deg)
    rot_x = np.eye(4, dtype=np.float32)
    rot_x[1, 1], rot_x[1, 2] = np.cos(phi), -np.sin(phi)
    rot_x[2, 1], rot_x[2, 2] = np.sin(phi), np.cos(phi)

    theta = np.deg2rad(theta_deg)
    rot_y = np.eye(4, dtype=np.float32)
    rot_y[0, 0], rot_y[0, 2] = np.cos(theta), -np.sin(theta)
    rot_y[2, 0], rot_y[2, 2] = np.sin(theta), np.cos(theta)

    flip = np.array(
        [[-1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=np.float32
    )
    return flip @ rot_y @ rot_x @ trans


def orbit_poses(num_views: int, phi_deg: float = -30.0, radius: float = 4.0) -> np.ndarray:
    """(num_views, 4, 4) poses evenly spaced in azimuth (``load_blender.py:174-176``)."""
    thetas = np.linspace(-180.0, 180.0, num_views + 1)[:-1]
    return np.stack([pose_spherical(t, phi_deg, radius) for t in thetas])


def render_ground_truth(
    scene: GaussianBlobScene,
    camera: cameras.CameraParams,
    extrinsic: jnp.ndarray,
    t_near: float = 2.0,
    t_far: float = 6.0,
    num_samples: int = 256,
) -> jnp.ndarray:
    """Render the analytic scene with midpoint quadrature -> (H, W, 3).

    Deterministic (midpoint samples, no jitter) and independent of the
    learned model — the 'golden' image generator for tests.
    """
    h, w = camera.img_height, camera.img_width
    num_pixels = h * w
    chunk = 8192  # bound the (rays, S, 3) sample tensor: full-res frames
    # would otherwise materialize multi-GB intermediates (800^2 x 256 x 3)
    num_chunks = -(-num_pixels // chunk)
    pixel_idx = jnp.minimum(
        jnp.arange(num_chunks * chunk, dtype=jnp.int32), num_pixels - 1
    )
    o, d = cameras.rays_for_pixels(pixel_idx, camera, extrinsic)

    mids = (jnp.arange(num_samples, dtype=jnp.float32) + 0.5) / num_samples
    ts = t_near + (t_far - t_near) * mids  # (S,)

    def render_chunk(args):
        oc, dc = args
        pts = oc[:, None, :] + ts[None, :, None] * dc[:, None, :]
        sigma, rgb = scene.field(pts)
        delta = jnp.full_like(sigma, (t_far - t_near) / num_samples)
        pixel_rgb, _ = integration.composite(sigma, rgb, delta)
        return pixel_rgb

    rgb = jax.lax.map(
        render_chunk, (o.reshape(num_chunks, chunk, 3), d.reshape(num_chunks, chunk, 3))
    )
    return rgb.reshape(-1, 3)[:num_pixels].reshape(h, w, 3)


# disjoint camera sets per split: azimuth offset (fraction of the view
# spacing) and elevation, so val/test views are genuinely novel — the
# procedural analogue of Blender's transforms_{train,val,test}.json
_SPLIT_VIEWS = {"train": (0.0, -30.0), "val": (1.0 / 3.0, -26.0), "test": (2.0 / 3.0, -34.0)}


def split_poses(num_views: int, split: str, radius: float = 4.0) -> np.ndarray:
    """(num_views, 4, 4) orbital poses for a named split (disjoint sets)."""
    offset_frac, phi = _SPLIT_VIEWS[split]
    spacing = 360.0 / num_views
    thetas = -180.0 + spacing * (np.arange(num_views) + offset_frac)
    return np.stack([pose_spherical(t, phi, radius) for t in thetas])


def make_dataset(
    num_views: int = 8,
    img_size: int = 64,
    focal: float | None = None,
    scene: GaussianBlobScene | None = None,
    t_near: float = 2.0,
    t_far: float = 6.0,
    split: str = "train",
) -> Tuple[np.ndarray, np.ndarray, cameras.CameraParams, GaussianBlobScene]:
    """Posed image set of the analytic scene.

    Returns ``(images (V, H*W, 3) float32, poses (V, 4, 4), camera, scene)``
    ready for ``train.make_image_train_step``. The focal length scales with
    ``img_size`` so every split/resolution images the same field of view.
    """
    scene = scene or GaussianBlobScene()
    focal = focal if focal is not None else 1.2 * img_size
    camera = cameras.CameraParams(
        focal_x=focal, focal_y=focal, img_width=img_size, img_height=img_size
    )
    poses = split_poses(num_views, split)
    render = jax.jit(
        lambda pose: render_ground_truth(scene, camera, pose, t_near, t_far)
    )
    images = np.stack([np.asarray(render(jnp.asarray(p))) for p in poses])
    return images.reshape(num_views, -1, 3), poses, camera, scene
