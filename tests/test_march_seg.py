"""Two-phase segment marcher == dense-lattice marcher (same sample set)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from google_nerf_tpu.ops.grid import pack_occupancy_u8
from google_nerf_tpu.ops.march_seg import (march_rays_train_seg,
                                           required_dilation_radius)
from google_nerf_tpu.ops.marching import march_rays_train
from google_nerf_tpu.ops.ray_aabb import clamp_near, ray_aabb_intersect

KEY = jax.random.PRNGKey(0)
SCALE = 0.5
G = 32
MAX_SAMPLES = 256
K = 32


def make_scene(key, density=0.02):
    occ = jax.random.bernoulli(key, density, (1, G, G, G))
    k1, k2 = jax.random.split(key)
    rays_o = jax.random.uniform(k1, (64, 3), minval=-1.2, maxval=1.2)
    rays_d = jax.random.normal(k2, (64, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    hits = clamp_near(ray_aabb_intersect(rays_o, rays_d, jnp.zeros(3),
                                         jnp.full((3,), SCALE)), 0.05)
    noise = jax.random.uniform(jax.random.fold_in(key, 3), (64,))
    return occ, rays_o, rays_d, hits, noise


@pytest.mark.parametrize("density", [0.005, 0.05])
def test_seg_matches_dense(density):
    occ, rays_o, rays_d, hits, noise = make_scene(KEY, density)
    dense = march_rays_train(rays_o, rays_d, hits, occ, cascades=1,
                             scale=SCALE, exp_step_factor=0.0, grid_size=G,
                             max_samples=MAX_SAMPLES, k_samples=K,
                             noise=noise)
    seg = 8
    r = required_dilation_radius(seg, G, MAX_SAMPLES, SCALE)
    occ_u8 = pack_occupancy_u8(occ, r)
    out = march_rays_train_seg(rays_o, rays_d, hits, occ_u8, cascades=1,
                               scale=SCALE, grid_size=G,
                               max_samples=MAX_SAMPLES, k_samples=K,
                               noise=noise, seg=seg,
                               n_keep=MAX_SAMPLES // seg)  # no truncation
    np.testing.assert_array_equal(np.asarray(out["valid"]),
                                  np.asarray(dense["valid"]))
    np.testing.assert_allclose(np.asarray(out["ts"]),
                               np.asarray(dense["ts"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["deltas"]),
                               np.asarray(dense["deltas"]), rtol=1e-5,
                               atol=1e-6)
    assert int(out["total_samples"]) == int(dense["total_samples"])


def test_seg_truncation_is_prefix():
    """With a small n_keep, found samples must be a prefix of the dense
    result (conservative truncation, never wrong samples)."""
    occ, rays_o, rays_d, hits, noise = make_scene(
        jax.random.fold_in(KEY, 9), 0.2)
    dense = march_rays_train(rays_o, rays_d, hits, occ, cascades=1,
                             scale=SCALE, exp_step_factor=0.0, grid_size=G,
                             max_samples=MAX_SAMPLES, k_samples=K,
                             noise=noise)
    seg = 8
    occ_u8 = pack_occupancy_u8(
        occ, required_dilation_radius(seg, G, MAX_SAMPLES, SCALE))
    out = march_rays_train_seg(rays_o, rays_d, hits, occ_u8, cascades=1,
                               scale=SCALE, grid_size=G,
                               max_samples=MAX_SAMPLES, k_samples=K,
                               noise=noise, seg=seg, n_keep=4)
    ts_s, ts_d = np.asarray(out["ts"]), np.asarray(dense["ts"])
    v_s, v_d = np.asarray(out["valid"]), np.asarray(dense["valid"])
    for r in range(ts_s.shape[0]):
        n = v_s[r].sum()
        assert n <= v_d[r].sum()
        # valid slots may be scattered (full-capacity path skips the
        # prefix compaction); the KEPT SET must equal the dense prefix
        np.testing.assert_allclose(ts_s[r][v_s[r]], ts_d[r, :n], rtol=1e-5,
                                   atol=1e-6)


def test_dilation_radius_monotone():
    assert required_dilation_radius(8, 128, 1024, 0.5) >= 1
    assert (required_dilation_radius(16, 128, 1024, 0.5)
            >= required_dilation_radius(8, 128, 1024, 0.5))


@pytest.mark.parametrize("density", [0.005, 0.05])
def test_three_phase_matches_dense(density):
    occ, rays_o, rays_d, hits, noise = make_scene(
        jax.random.fold_in(KEY, 33), density)
    dense = march_rays_train(rays_o, rays_d, hits, occ, cascades=1,
                             scale=SCALE, exp_step_factor=0.0, grid_size=G,
                             max_samples=MAX_SAMPLES, k_samples=K,
                             noise=noise)
    seg, sup = 8, 4
    r1 = required_dilation_radius(seg, G, MAX_SAMPLES, SCALE)
    r2 = required_dilation_radius(seg * sup, G, MAX_SAMPLES, SCALE)
    occ_u8 = pack_occupancy_u8(occ, r1, super_radius=r2)
    out = march_rays_train_seg(rays_o, rays_d, hits, occ_u8, cascades=1,
                               scale=SCALE, grid_size=G,
                               max_samples=MAX_SAMPLES, k_samples=K,
                               noise=noise, seg=seg,
                               n_keep=MAX_SAMPLES // seg, sup=sup,
                               n_keep_sup=MAX_SAMPLES // (seg * sup))
    np.testing.assert_array_equal(np.asarray(out["valid"]),
                                  np.asarray(dense["valid"]))
    np.testing.assert_allclose(np.asarray(out["ts"]),
                               np.asarray(dense["ts"]), rtol=1e-5,
                               atol=1e-6)
