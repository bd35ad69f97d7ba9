import pytest
"""Block-word packed occupancy (ops/grid.pack_occupancy_u8 bits 3..29) and
the grouped lookups built on it (ops/march_seg)."""
import numpy as np

import jax
import jax.numpy as jnp

from google_nerf_tpu.ops.grid import pack_occupancy_u8
from google_nerf_tpu.ops.march_seg import (_cell_index_single,
                                           _occ_bits_lookup,
                                           _occ_block_lookup,
                                           _seg_live_block, _word_group)

KEY = jax.random.PRNGKey(7)
G = 16
SCALE = 0.5


def _random_occ(key, density=0.2):
    return jax.random.bernoulli(key, density, (1, G, G, G))


def test_block_bits_match_shifted_occ():
    occ = _random_occ(KEY)
    w = np.asarray(pack_occupancy_u8(occ, 1))
    o = np.asarray(occ[0])
    assert w.dtype == np.int32
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                bit = 3 + dx * 9 + dy * 3 + dz
                got = (w[0] >> bit) & 1
                exp = np.zeros_like(got)
                exp[:G - dx or G, :G - dy or G, :G - dz or G] = \
                    o[dx:, dy:, dz:]
                np.testing.assert_array_equal(got, exp,
                                              err_msg=f"d=({dx},{dy},{dz})")
    # bit 3 (d=0) duplicates bit 0
    np.testing.assert_array_equal((w >> 3) & 1, w & 1)


def test_block_lookup_equals_per_candidate_bit0():
    occ = _random_occ(jax.random.fold_in(KEY, 1))
    packed = pack_occupancy_u8(occ, 1)
    # candidate chains along random unit directions, spacing small enough
    # that groups of 8 span < 2 cells per axis
    n_rays, g = 64, 8
    k1, k2 = jax.random.split(jax.random.fold_in(KEY, 2))
    origins = jax.random.uniform(k1, (n_rays, 1, 3), minval=-.45,
                                 maxval=.45)
    dirs = jax.random.normal(k2, (n_rays, 1, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cell = 2 * SCALE / G
    dt = 0.24 * cell                     # span (g-1)*dt = 1.68 cells < 2
    ts = jnp.arange(g, dtype=jnp.float32)[None, :, None] * dt
    xyz = origins + ts * dirs            # (n_rays, g, 3)
    got = _occ_block_lookup(packed, xyz, SCALE, G, g)
    exp = _occ_bits_lookup(packed, xyz, jnp.full(xyz.shape[:-1], dt),
                           1, SCALE, G, bit=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exp))


@pytest.mark.slow
def test_seg_live_block_conservative():
    """Segment liveness must have zero false negatives vs the exact
    per-candidate test, for any segment whose span is < 2 cells."""
    occ = _random_occ(jax.random.fold_in(KEY, 3), density=0.05)
    packed = pack_occupancy_u8(occ, 1)
    n_rays, seg = 128, 8
    k1, k2, k3 = jax.random.split(jax.random.fold_in(KEY, 4), 3)
    rays_o = jax.random.uniform(k1, (n_rays, 3), minval=-.6, maxval=.6)
    rays_d = jax.random.normal(k2, (n_rays, 3))
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    cell = 2 * SCALE / G
    dt = 0.2 * cell
    assert _word_group(seg, dt, SCALE, G) == seg
    t_first = jax.random.uniform(k3, (n_rays, 4), minval=0.0, maxval=1.0)
    live = _seg_live_block(packed, rays_o, rays_d, t_first, seg, dt,
                           SCALE, G)
    # exact candidate occupancy
    ts = t_first[..., None] + jnp.arange(seg, dtype=jnp.float32) * dt
    xyz = rays_o[:, None, None, :] + ts[..., None] * rays_d[:, None, None, :]
    exact = _occ_bits_lookup(packed, xyz, jnp.full(xyz.shape[:-1], dt),
                             1, SCALE, G, bit=0).any(-1)
    assert not bool((exact & ~live).any()), "false-negative liveness"


def test_cell_index_matches_bits_lookup_mapping():
    xyz = (jax.random.uniform(KEY, (256, 3)) * 2 - 1) * 0.7
    n = np.asarray(_cell_index_single(xyz, SCALE, G))
    assert n.min() >= 0 and n.max() <= G - 1
    occ = jnp.zeros((1, G, G, G), bool).at[
        0, n[:, 0], n[:, 1], n[:, 2]].set(True)
    packed = pack_occupancy_u8(occ, 1)
    hit = _occ_bits_lookup(packed, xyz, jnp.full((256,), 0.01), 1, SCALE,
                           G, bit=0)
    assert bool(jnp.all(hit))
