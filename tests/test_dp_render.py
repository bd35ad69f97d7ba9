"""Data-parallel test renderer == single-device renderer, exactly.

The DP validation path (parallel/dp.py render_test_fast_dp) shards rays over
the mesh with no collectives; chunks are independent, so results must match
the serial renderer bit-for-bit on the CPU mesh (reference analog:
per-rank validation + metric all-gather, `ngp_pl/train.py:218-227`).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from google_nerf_tpu.core.rays import get_rays
from google_nerf_tpu.data.synthetic import SyntheticDataset
from google_nerf_tpu.models.ngp import NGPConfig, init_ngp
from google_nerf_tpu.models.render_test_fast import render_test_fast
from google_nerf_tpu.ops.grid import pack_occupancy_u8
from google_nerf_tpu.models.render_test_oneshot import render_test_oneshot
from google_nerf_tpu.ops.march_seg import required_dilation_radius
from google_nerf_tpu.parallel.dp import (make_mesh, render_test_fast_dp,
                                         render_test_oneshot_dp)


def test_dp_render_matches_serial():
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=32,
                    packed_log2_size=12, packed_levels=4)
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(24, 20))
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    # half-occupied grid so rays march through real structure
    key = jax.random.PRNGKey(3)
    occ = jax.random.bernoulli(
        key, 0.2, (cfg.cascades,) + (cfg.grid_size,) * 3)
    occ_u8 = pack_occupancy_u8(occ, 2, super_radius=5)
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))

    kw = dict(k=8, seg=8, n_segs=8, n_keep=4, max_samples=256,
              bucket=64, chunk=128)
    ref = render_test_fast(params, cfg, occ_u8, o, d, **kw)
    mesh = make_mesh(4)
    got = render_test_fast_dp(params, cfg, occ_u8, o, d, mesh, **kw)
    for k in ("rgb", "opacity", "depth"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)
    # 480 rays over 4 replicas: each replica rendered a 120-ray shard
    assert got["rgb"].shape == ref["rgb"].shape


@pytest.mark.slow
def test_dp_oneshot_matches_serial():
    """The flagship serving renderer (one-shot + drain) sharded over the
    mesh must match the serial run exactly — the linear-FPS-scaling claim
    rests on rays being fully independent."""
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=32,
                    packed_log2_size=12, packed_levels=4)
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(24, 20))
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(3)
    occ = jax.random.bernoulli(
        key, 0.2, (cfg.cascades,) + (cfg.grid_size,) * 3)
    ms = 256
    occ_u8 = pack_occupancy_u8(
        occ, required_dilation_radius(8, cfg.grid_size, ms, cfg.scale),
        super_radius=required_dilation_radius(32, cfg.grid_size, ms,
                                              cfg.scale))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))

    kw = dict(max_samples=ms, k=16, n_keep=8, sup=4, n_keep_sup=8,
              chunk=128, straggler_div=8, budget_div=0, drain=True,
              T_threshold=1e-4)
    ref = render_test_oneshot(params, cfg, occ_u8, o, d, **kw)
    mesh = make_mesh(4)
    got = render_test_oneshot_dp(params, cfg, occ_u8, o, d, mesh, **kw)
    for k in ("rgb", "opacity", "depth"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_dp_oneshot_compact_matches_serial():
    """compact-main (block2 occ dict + phase-A cull) through the DP
    wrapper: dict occupancy must replicate, scalar drain stats must be
    filtered, and the sharded image must equal the serial one."""
    from google_nerf_tpu.models.render_test_oneshot import render_test_oneshot
    from google_nerf_tpu.ops.march_block import pack_occupancy_block2
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=32,
                    packed_log2_size=12, packed_levels=4)
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(24, 20))
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    params["packed_table"] = params["packed_table"] * 2e3
    occ = jax.random.bernoulli(
        jax.random.PRNGKey(6), 0.1, (cfg.cascades,) + (cfg.grid_size,) * 3)
    ms = 256
    occ2 = pack_occupancy_block2(occ, max_samples=ms, scale=cfg.scale)
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    kw = dict(max_samples=ms, k=16, n_keep=8, chunk=120, budget_div=0,
              straggler_div=2, drain=True, T_threshold=1e-4,
              march="block2", compact_main=True)
    ref = render_test_oneshot(params, cfg, occ2, o, d, **kw)
    mesh = make_mesh(4)
    got = render_test_oneshot_dp(params, cfg, occ2, o, d, mesh, **kw)
    for key in ("rgb", "opacity", "depth"):
        np.testing.assert_allclose(np.asarray(got[key]),
                                   np.asarray(ref[key]), atol=1e-5,
                                   err_msg=key)
