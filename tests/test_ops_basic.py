"""Tests for morton/packbits, trunc_exp, ray-AABB (vs naive references)."""
import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.ops import morton as M
from google_nerf_tpu.ops.ray_aabb import (clamp_near, ray_aabb_intersect,
                                          ray_sphere_intersect)
from google_nerf_tpu.ops.trunc_exp import trunc_exp


def _morton_ref(x, y, z):
    out = 0
    for i in range(10):
        out |= ((x >> i) & 1) << (3 * i)
        out |= ((y >> i) & 1) << (3 * i + 1)
        out |= ((z >> i) & 1) << (3 * i + 2)
    return out


def test_morton_roundtrip_and_golden():
    rng = np.random.RandomState(0)
    coords = rng.randint(0, 1024, size=(256, 3)).astype(np.int32)
    codes = np.asarray(M.morton3d(jnp.asarray(coords)))
    ref = np.array([_morton_ref(*c) for c in coords])
    np.testing.assert_array_equal(codes, ref)
    inv = np.asarray(M.morton3d_invert(jnp.asarray(codes)))
    np.testing.assert_array_equal(inv, coords)


def test_morton_is_bijection_on_small_grid():
    g = 8
    xs, ys, zs = np.meshgrid(range(g), range(g), range(g), indexing="ij")
    coords = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.int32)
    codes = np.asarray(M.morton3d(jnp.asarray(coords)))
    assert len(np.unique(codes)) == g ** 3
    assert codes.max() == g ** 3 - 1


def test_packbits_unpackbits():
    rng = np.random.RandomState(1)
    grid = rng.randn(4 * 64).astype(np.float32)
    bf = np.asarray(M.packbits(jnp.asarray(grid), 0.0))
    assert bf.dtype == np.uint8 and bf.shape == (32,)
    unpacked = np.asarray(M.unpackbits(jnp.asarray(bf)))
    np.testing.assert_array_equal(unpacked, grid > 0.0)


def test_trunc_exp_forward_and_clamped_grad():
    x = jnp.array([-20.0, 0.0, 2.0, 20.0])
    np.testing.assert_allclose(trunc_exp(x), np.exp(np.asarray(x)),
                               rtol=1e-5)
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    expected = np.exp(np.clip(np.asarray(x), -15, 15))
    np.testing.assert_allclose(g, expected, rtol=1e-4)


def test_ray_aabb_center_hit_and_miss():
    o = jnp.array([[0.0, 0.0, -2.0], [0.0, 2.0, -2.0], [0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    hits = np.asarray(ray_aabb_intersect(o, d, jnp.zeros(3), 0.5 * jnp.ones(3)))
    np.testing.assert_allclose(hits[0], [1.5, 2.5], atol=1e-6)   # front hit
    np.testing.assert_allclose(hits[1], [-1, -1], atol=1e-6)     # miss
    np.testing.assert_allclose(hits[2], [0.0, 0.5], atol=1e-6)   # inside box


def test_ray_aabb_unnormalized_dirs():
    o = jnp.array([[0.0, 0.0, -2.0]])
    d = jnp.array([[0.0, 0.0, 2.0]])  # length 2 -> t halves
    hits = np.asarray(ray_aabb_intersect(o, d, jnp.zeros(3), 0.5 * jnp.ones(3)))
    np.testing.assert_allclose(hits[0], [0.75, 1.25], atol=1e-6)


def test_clamp_near():
    hits = jnp.array([[0.01, 2.0], [-1.0, -1.0], [0.3, 1.0]])
    out = np.asarray(clamp_near(hits, 0.05))
    np.testing.assert_allclose(out[:, 0], [0.05, -1.0, 0.3], atol=1e-7)


def test_ray_sphere():
    o = jnp.array([[0.0, 0.0, -3.0], [0.0, 5.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    hits = np.asarray(ray_sphere_intersect(o, d, jnp.zeros(3), 1.0))
    np.testing.assert_allclose(hits[0], [2.0, 4.0], atol=1e-5)
    np.testing.assert_allclose(hits[1], [-1, -1], atol=1e-6)
