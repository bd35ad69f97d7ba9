"""Golden tests for camera/ray math (reference ngp_pl/datasets/ray_utils.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from google_nerf_tpu.core import rays as R


def _simple_K(fx=100.0, fy=100.0, cx=4.0, cy=3.0):
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)


def test_ray_directions_center_pixel():
    H, W = 6, 8
    K = _simple_K()
    d = R.get_ray_directions(H, W, K, flatten=False)
    assert d.shape == (H, W, 3)
    # pixel (v=3, u=4): u - cx + 0.5 = 0.5 -> x = 0.005
    np.testing.assert_allclose(d[3, 4], [0.005, 0.005, 1.0], atol=1e-6)
    # top-left pixel
    np.testing.assert_allclose(
        d[0, 0], [(-4 + 0.5) / 100, (-3 + 0.5) / 100, 1.0], atol=1e-6)


def test_ray_directions_rub_convention():
    H, W = 4, 4
    K = _simple_K(cx=2.0, cy=2.0)
    d_rdf = R.get_ray_directions(H, W, K, flatten=False)
    d_rub = R.get_ray_directions_scannet_v2(H, W, K, flatten=False)
    np.testing.assert_allclose(d_rub[..., 0], d_rdf[..., 0])
    np.testing.assert_allclose(d_rub[..., 1], -d_rdf[..., 1])
    np.testing.assert_allclose(d_rub[..., 2], -d_rdf[..., 2])


def test_get_rays_identity_pose():
    dirs = jnp.array([[0.1, -0.2, 1.0], [0.0, 0.0, 1.0]])
    c2w = jnp.concatenate([jnp.eye(3), jnp.array([[1.0], [2.0], [3.0]])], 1)
    o, d = R.get_rays(dirs, c2w)
    np.testing.assert_allclose(o, [[1, 2, 3], [1, 2, 3]], atol=1e-6)
    np.testing.assert_allclose(d, dirs, atol=1e-6)


def test_get_rays_batched_rotation():
    rng = np.random.RandomState(0)
    dirs = jnp.asarray(rng.randn(5, 3).astype(np.float32))
    # random rotation via QR
    q, _ = np.linalg.qr(rng.randn(3, 3))
    t = rng.randn(3).astype(np.float32)
    c2w_single = jnp.asarray(
        np.concatenate([q.astype(np.float32), t[:, None]], 1))
    c2w_batch = jnp.broadcast_to(c2w_single, (5, 3, 4))
    o1, d1 = R.get_rays(dirs, c2w_single)
    o2, d2 = R.get_rays(dirs, c2w_batch)
    np.testing.assert_allclose(d1, d2, atol=1e-5)
    np.testing.assert_allclose(o1, o2, atol=1e-5)
    # rays_d = dirs @ R^T
    np.testing.assert_allclose(d1, np.asarray(dirs) @ q.T.astype(np.float32),
                               atol=1e-5)


def test_axisangle_to_R_small_angle_and_90deg():
    v = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, np.pi / 2]])
    Rm = R.axisangle_to_R(v)
    np.testing.assert_allclose(Rm[0], np.eye(3), atol=1e-5)
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(Rm[1], expected, atol=1e-5)
    # orthonormality
    np.testing.assert_allclose(Rm[1] @ Rm[1].T, np.eye(3), atol=1e-5)


def test_center_poses_recenters():
    rng = np.random.RandomState(1)
    poses = np.tile(np.eye(4)[:3], (4, 1, 1)).astype(np.float64)
    poses[:, :, 3] = rng.randn(4, 3) + 5.0
    pts = rng.randn(50, 3) + 5.0
    poses_c, pts_c = R.center_poses(poses, pts)
    # NOTE: like the reference (ray_utils.py:270), pts_c carries a trailing
    # homogeneous column of ones; xyz must be recentered to the origin.
    np.testing.assert_allclose(pts_c[:, :3].mean(0), 0.0, atol=1e-8)
    np.testing.assert_allclose(pts_c[:, 3], 1.0, atol=1e-12)


def test_spheric_poses_shape():
    p = R.create_spheric_poses(4.0, 1.0, n_poses=10)
    assert p.shape == (10, 3, 4)
    # all cameras at equal distance from the z axis region
    d = np.linalg.norm(p[:, :, 3], axis=-1)
    np.testing.assert_allclose(d, d[0], atol=1e-6)
