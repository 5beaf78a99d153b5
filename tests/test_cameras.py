"""Unit tests for ray generation: screen-coord y-flip, camera rays, NDC."""

import jax.numpy as jnp
import numpy as np

from torch_nerf_tpu import cameras


CAM = cameras.CameraParams(focal_x=100.0, focal_y=100.0, img_width=8, img_height=6)


def test_screen_coords_y_flip():
    coords = np.asarray(cameras.generate_screen_coords(6, 8))
    assert coords.shape == (48, 2)
    # pixel 0 = row 0, col 0 -> x=0, y=H-1
    np.testing.assert_allclose(coords[0], [0.0, 5.0])
    # pixel (row 2, col 3) -> flat 2*8+3=19 -> x=3, y=5-2=3
    np.testing.assert_allclose(coords[19], [3.0, 3.0])
    # last pixel -> x=W-1, y=0
    np.testing.assert_allclose(coords[-1], [7.0, 0.0])


def test_screen_coords_from_indices_matches_table():
    table = np.asarray(cameras.generate_screen_coords(6, 8))
    idx = jnp.arange(48, dtype=jnp.int32)
    arith = np.asarray(cameras.screen_coords_from_indices(idx, 6, 8))
    np.testing.assert_allclose(arith, table)


def test_camera_ray_directions():
    coords = jnp.array([[4.0, 3.0], [0.0, 0.0]])  # center pixel, corner
    d = np.asarray(cameras.camera_ray_directions(coords, CAM))
    # center (cx=4, cy=3) -> (0, 0, -1)
    np.testing.assert_allclose(d[0], [0.0, 0.0, -1.0], atol=1e-7)
    np.testing.assert_allclose(d[1], [-4.0 / 100.0, -3.0 / 100.0, -1.0], atol=1e-7)


def test_rays_from_screen_world_transform():
    rng = np.random.default_rng(1)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    t = np.array([1.0, -2.0, 3.0])
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = q
    ext[:3, 3] = t

    coords = jnp.array([[2.0, 5.0]])
    o, d = cameras.rays_from_screen(coords, CAM, jnp.asarray(ext))
    d_cam = np.array([(2.0 - 4.0) / 100.0, (5.0 - 3.0) / 100.0, -1.0])
    np.testing.assert_allclose(np.asarray(d)[0], q @ d_cam, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(o)[0], t, rtol=1e-6)


def test_ndc_projection_formulas():
    rng = np.random.default_rng(2)
    n = 32
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o[:, 2] = -np.abs(o[:, 2]) - 1.0  # rays in front of the camera (z<0)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5

    focal, z_near, H, W = 50.0, 1.0, 10, 12
    po, pd = cameras.ndc_rays(jnp.asarray(o), jnp.asarray(d), focal, z_near, H, W)
    po, pd = np.asarray(po), np.asarray(pd)

    np.testing.assert_allclose(
        po[:, 0], -(2 * focal / W) * (o[:, 0] / o[:, 2]), rtol=1e-5
    )
    np.testing.assert_allclose(
        po[:, 1], -(2 * focal / H) * (o[:, 1] / o[:, 2]), rtol=1e-5
    )
    np.testing.assert_allclose(po[:, 2], 1 + 2 * z_near / o[:, 2], rtol=1e-5)
    np.testing.assert_allclose(
        pd[:, 0],
        -(2 * focal / W) * (d[:, 0] / d[:, 2] - o[:, 0] / o[:, 2]),
        rtol=1e-4,
        atol=1e-6,
    )
    np.testing.assert_allclose(pd[:, 2], -2 * z_near / o[:, 2], rtol=1e-5)


def test_ndc_point_at_infinity_maps_to_one():
    # a ray's NDC z should approach 1 as t -> inf (o'_z + t'*d'_z with t'->1)
    o = jnp.array([[0.0, 0.0, -1.0]])
    d = jnp.array([[0.1, 0.05, -1.0]])
    po, pd = cameras.ndc_rays(o, d, 50.0, 1.0, 10, 10)
    # world point at t=1e6 along the ray
    far_world_z = float(o[0, 2] + 1e6 * d[0, 2])
    assert far_world_z < -1e5
    # NDC z at t'=1 equals o'_z + d'_z = (1 + 2/oz) + (-2/oz) = 1
    assert np.isclose(float(po[0, 2] + pd[0, 2]), 1.0, atol=1e-5)


def test_intrinsic_matrix_form():
    mat = np.asarray(CAM.intrinsic_matrix())
    np.testing.assert_allclose(
        mat,
        np.array(
            [
                [100.0, 0, 4.0, 0],
                [0, 100.0, 3.0, 0],
                [0, 0, 0, 0],
                [0, 0, -1.0, 0],
            ]
        ),
    )
