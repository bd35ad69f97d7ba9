"""One-phase block marcher == dense-lattice marcher (same sample set)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from google_nerf_tpu.ops.grid import pack_occupancy_blocks
from google_nerf_tpu.ops.march_block import (block_group,
                                             march_rays_train_block)
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


def test_block_group_span():
    """The auto group size must satisfy the <= BLOCK-1 cell-span bound."""
    for ms in (256, 512, 1024):
        g = block_group(ms, SCALE, 128)
        assert g >= 1 and ms % g == 0
        cells_per_step = (3.0 ** 0.5 / ms) * 128 / (2.0 * min(0.5, SCALE))
        assert (g - 1) * cells_per_step < 7.0


@pytest.mark.parametrize("density", [0.005, 0.05])
@pytest.mark.parametrize("group", [0, 4])
def test_block_matches_dense(density, group):
    occ, rays_o, rays_d, hits, noise = make_scene(KEY, density)
    dense = march_rays_train(rays_o, rays_d, hits, occ, cascades=1,
                             scale=SCALE, exp_step_factor=0.0, grid_size=G,
                             max_samples=MAX_SAMPLES, k_samples=K,
                             noise=noise)
    blocks = pack_occupancy_blocks(occ)
    out = march_rays_train_block(
        rays_o, rays_d, hits, blocks, scale=SCALE, grid_size=G,
        max_samples=MAX_SAMPLES, k_samples=K, noise=noise, group=group,
        n_keep_groups=MAX_SAMPLES // (group or
                                      block_group(MAX_SAMPLES, SCALE, G)))
    np.testing.assert_array_equal(np.asarray(out["valid"]),
                                  np.asarray(dense["valid"]))
    np.testing.assert_allclose(np.asarray(out["ts"]),
                               np.asarray(dense["ts"]), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["deltas"]),
                               np.asarray(dense["deltas"]), rtol=1e-5,
                               atol=1e-6)
    assert int(out["total_samples"]) == int(dense["total_samples"])


def test_block_truncation_keeps_prefix_groups():
    """With few keep-groups, every kept sample must appear in the dense
    result and kept groups must be the FIRST live groups (never later ones
    replacing earlier content)."""
    occ, rays_o, rays_d, hits, noise = make_scene(
        jax.random.fold_in(KEY, 9), 0.2)
    dense = march_rays_train(rays_o, rays_d, hits, occ, cascades=1,
                             scale=SCALE, exp_step_factor=0.0, grid_size=G,
                             max_samples=MAX_SAMPLES, k_samples=MAX_SAMPLES,
                             noise=noise)
    blocks = pack_occupancy_blocks(occ)
    out = march_rays_train_block(rays_o, rays_d, hits, blocks, scale=SCALE,
                                 grid_size=G, max_samples=MAX_SAMPLES,
                                 k_samples=64, noise=noise,
                                 n_keep_groups=2)
    ts_b, v_b = np.asarray(out["ts"]), np.asarray(out["valid"])
    ts_d, v_d = np.asarray(dense["ts"]), np.asarray(dense["valid"])
    for r in range(ts_b.shape[0]):
        kept = np.sort(ts_b[r][v_b[r]])
        ref = np.sort(ts_d[r][v_d[r]])
        assert len(kept) <= len(ref)
        if len(kept):
            # every kept t must be a dense sample, and they must be the
            # earliest ones reachable within the kept groups (a prefix of
            # the dense t's up to the last kept group's end)
            assert np.all(np.isin(np.round(kept, 6), np.round(ref, 6)))
            n_prefix = (ref <= kept[-1] + 1e-6).sum()
            assert n_prefix == len(kept)


def _occ2(occ, ms):
    from google_nerf_tpu.ops.march_block import pack_occupancy_block2
    return pack_occupancy_block2(occ, max_samples=ms, scale=SCALE)


@pytest.mark.parametrize("density", [0.005, 0.05])
def test_block2_matches_dense(density):
    """Two-phase marcher == dense marcher at ample keep capacity (the
    super table is a conservative superset, so no sample can be lost)."""
    from google_nerf_tpu.ops.march_block import march_rays_train_block2
    occ, rays_o, rays_d, hits, noise = make_scene(KEY, density)
    dense = march_rays_train(rays_o, rays_d, hits, occ, cascades=1,
                             scale=SCALE, exp_step_factor=0.0, grid_size=G,
                             max_samples=MAX_SAMPLES, k_samples=K,
                             noise=noise)
    out = march_rays_train_block2(
        rays_o, rays_d, hits, _occ2(occ, MAX_SAMPLES), scale=SCALE,
        grid_size=G, max_samples=MAX_SAMPLES, k_samples=K, noise=noise,
        n_keep_super=64, n_keep_groups=MAX_SAMPLES)
    np.testing.assert_array_equal(np.asarray(out["valid"]),
                                  np.asarray(dense["valid"]))
    np.testing.assert_allclose(np.asarray(out["ts"]),
                               np.asarray(dense["ts"]), rtol=1e-5,
                               atol=1e-6)
    assert int(out["total_samples"]) == int(dense["total_samples"])


def test_block2_truncation_keeps_prefix():
    """Truncated block2 output must be a prefix of the dense sample set
    (first-k supers, then first-k groups), with truncated+t_resume
    conservative (no unexamined candidate before t_resume)."""
    from google_nerf_tpu.ops.march_block import march_rays_train_block2
    occ, rays_o, rays_d, hits, noise = make_scene(
        jax.random.fold_in(KEY, 9), 0.2)
    dense = march_rays_train(rays_o, rays_d, hits, occ, cascades=1,
                             scale=SCALE, exp_step_factor=0.0, grid_size=G,
                             max_samples=MAX_SAMPLES, k_samples=MAX_SAMPLES,
                             noise=noise)
    out = march_rays_train_block2(
        rays_o, rays_d, hits, _occ2(occ, MAX_SAMPLES), scale=SCALE,
        grid_size=G, max_samples=MAX_SAMPLES, k_samples=64, noise=noise,
        n_keep_super=2, n_keep_groups=4)
    ts_b, v_b = np.asarray(out["ts"]), np.asarray(out["valid"])
    ts_d, v_d = np.asarray(dense["ts"]), np.asarray(dense["valid"])
    t_res = np.asarray(out["t_resume"])
    trunc = np.asarray(out["truncated"])
    for r in range(ts_b.shape[0]):
        kept = np.sort(ts_b[r][v_b[r]])
        ref = np.sort(ts_d[r][v_d[r]])
        assert len(kept) <= len(ref)
        if len(kept):
            assert np.all(np.isin(np.round(kept, 6), np.round(ref, 6)))
        # every dense sample below t_resume must have been kept (nothing
        # examined-and-dropped before the resume point)
        if trunc[r]:
            missed = ref[(ref < t_res[r] - 1e-6)]
            assert np.all(np.isin(np.round(missed, 6), np.round(kept, 6)))
        else:
            assert len(kept) == len(ref)


def test_pack_blocks4_bits():
    """Stride-anchored table rows must equal the per-cell table at the
    strided anchors."""
    from google_nerf_tpu.ops.grid import pack_occupancy_blocks4
    occ = jax.random.bernoulli(KEY, 0.1, (1, 16, 16, 16))
    full = np.asarray(pack_occupancy_blocks(occ))
    b4 = np.asarray(pack_occupancy_blocks4(occ, 4))
    for ax in range(4):
        for ay in range(4):
            for az in range(4):
                got = b4[(ax * 4 + ay) * 4 + az]
                want = full[((4 * ax) * 16 + 4 * ay) * 16 + 4 * az]
                np.testing.assert_array_equal(got, want)


def test_pack_super_liveness_semantics():
    """Entry a == any occupancy within the forward window at 8a."""
    from google_nerf_tpu.ops.grid import pack_super_liveness
    occ = jax.random.bernoulli(jax.random.fold_in(KEY, 5), 0.01,
                               (1, 32, 32, 32))
    W = 13
    tab = np.asarray(pack_super_liveness(occ, W, 8)).reshape(4, 4, 4)
    occ_np = np.asarray(occ[0])
    for a in range(4):
        for b in range(4):
            for c in range(4):
                want = occ_np[8 * a:8 * a + W, 8 * b:8 * b + W,
                              8 * c:8 * c + W].any()
                assert bool(tab[a, b, c]) == bool(want)


def test_pack_occupancy_blocks_bits():
    """Direct check of the bit layout: random occ, random anchors."""
    occ = jax.random.bernoulli(KEY, 0.1, (1, 16, 16, 16))
    blocks = np.asarray(pack_occupancy_blocks(occ))
    occ_np = np.asarray(occ[0])
    rng = np.random.default_rng(0)
    for _ in range(200):
        ax, ay, az = rng.integers(0, 16, 3)
        dx, dy, dz = rng.integers(0, 8, 3)
        o = dx * 64 + dy * 8 + dz
        row = blocks[(ax * 16 + ay) * 16 + az]
        bit = (row[o // 32] >> (o % 32)) & 1
        x, y, z = ax + dx, ay + dy, az + dz
        want = (occ_np[x, y, z] if max(x, y, z) < 16 else False)
        assert bool(bit) == bool(want), (ax, ay, az, dx, dy, dz)
