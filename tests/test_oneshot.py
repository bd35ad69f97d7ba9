"""One-shot test renderer vs the while-loop fast renderer."""
import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.core.rays import get_rays
from google_nerf_tpu.data.synthetic import SyntheticDataset
from google_nerf_tpu.models.ngp import NGPConfig, init_ngp
from google_nerf_tpu.models.render_test_fast import render_test_fast
from google_nerf_tpu.models.render_test_oneshot import render_test_oneshot
from google_nerf_tpu.ops.grid import pack_occupancy_u8
from google_nerf_tpu.ops.march_seg import required_dilation_radius


def test_oneshot_matches_fast():
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=32,
                    packed_log2_size=12, packed_levels=4)
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    params["packed_table"] = params["packed_table"] * 2e3
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(24, 20))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    occ = jax.random.bernoulli(
        jax.random.PRNGKey(3), 0.15, (cfg.cascades,) + (cfg.grid_size,) * 3)
    ms = 256
    r = required_dilation_radius(8, cfg.grid_size, ms, cfg.scale)
    rs = required_dilation_radius(32, cfg.grid_size, ms, cfg.scale)
    occ_u8 = pack_occupancy_u8(occ, r, super_radius=rs)

    ref = render_test_fast(params, cfg, occ_u8, o, d, max_samples=ms,
                           k=8, seg=8, n_segs=8, n_keep=4, bucket=64,
                           chunk=480, T_threshold=1e-4)
    got = render_test_oneshot(params, cfg, occ_u8, o, d, max_samples=ms,
                              k=16, n_keep=8, sup=4, n_keep_sup=8,
                              chunk=480, passes=6, straggler_div=2,
                              T_threshold=1e-4)
    # both walk the same t1-anchored lattice on pass/round one; stragglers
    # re-anchor slightly differently, so compare at image level
    err = float(jnp.abs(got["rgb"] - ref["rgb"]).mean())
    errmax = float(jnp.abs(got["opacity"] - ref["opacity"]).mean())
    assert err < 0.02, err
    assert errmax < 0.03, errmax


def test_pooled_stragglers_multichunk_matches_fast():
    """Image-wide straggler pooling over a MULTI-CHUNK render must converge
    to the while-loop renderer's image when the pool has enough rounds to
    drain every alive ray (pool capacity binds scheduling, not the math)."""
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=32,
                    packed_log2_size=12, packed_levels=4)
    params = init_ngp(jax.random.PRNGKey(1), cfg)
    params["packed_table"] = params["packed_table"] * 2e3
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(24, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    occ = jax.random.bernoulli(
        jax.random.PRNGKey(5), 0.15,
        (cfg.cascades,) + (cfg.grid_size,) * 3)
    ms = 256
    occ_u8 = pack_occupancy_u8(
        occ, required_dilation_radius(8, cfg.grid_size, ms, cfg.scale),
        super_radius=required_dilation_radius(32, cfg.grid_size, ms,
                                              cfg.scale))
    ref = render_test_fast(params, cfg, occ_u8, o, d, max_samples=ms,
                           k=8, seg=8, n_segs=8, n_keep=4, bucket=64,
                           chunk=384, T_threshold=1e-4)
    got = render_test_oneshot(params, cfg, occ_u8, o, d, max_samples=ms,
                              k=16, n_keep=8, sup=4, n_keep_sup=8,
                              chunk=128, passes=16, straggler_div=1,
                              T_threshold=1e-4, pooled_stragglers=True)
    err = float(jnp.abs(got["rgb"] - ref["rgb"]).mean())
    erro = float(jnp.abs(got["opacity"] - ref["opacity"]).mean())
    assert err < 0.02, err
    assert erro < 0.03, erro


def test_dense_pass_matches_packed():
    """budget_div=0 (dense row-wise pass, no packing sort) must equal the
    packed-stream pass when the budget isn't binding (budget_div=1)."""
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=32,
                    packed_log2_size=12, packed_levels=4)
    params = init_ngp(jax.random.PRNGKey(2), cfg)
    params["packed_table"] = params["packed_table"] * 2e3
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(20, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    occ = jax.random.bernoulli(
        jax.random.PRNGKey(7), 0.15,
        (cfg.cascades,) + (cfg.grid_size,) * 3)
    ms = 256
    occ_u8 = pack_occupancy_u8(
        occ, required_dilation_radius(8, cfg.grid_size, ms, cfg.scale),
        super_radius=required_dilation_radius(32, cfg.grid_size, ms,
                                              cfg.scale))
    kw = dict(max_samples=ms, k=16, n_keep=8, sup=4, n_keep_sup=8,
              chunk=160, passes=6, straggler_div=1, T_threshold=1e-4)
    a = render_test_oneshot(params, cfg, occ_u8, o, d, budget_div=0, **kw)
    b = render_test_oneshot(params, cfg, occ_u8, o, d, budget_div=1, **kw)
    np.testing.assert_allclose(np.asarray(a["rgb"]), np.asarray(b["rgb"]),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(a["opacity"]),
                               np.asarray(b["opacity"]), rtol=1e-4,
                               atol=2e-4)


def test_drain_matches_fast_with_tiny_pool():
    """The while_loop drain must reach the while-loop renderer's image even
    when the per-trip pool is far too small for one scheduled pass (the
    fixed-`passes` schedule starves and under-renders in this regime)."""
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=32,
                    packed_log2_size=12, packed_levels=4)
    params = init_ngp(jax.random.PRNGKey(4), cfg)
    params["packed_table"] = params["packed_table"] * 2e3
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(24, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    occ = jax.random.bernoulli(
        jax.random.PRNGKey(9), 0.15,
        (cfg.cascades,) + (cfg.grid_size,) * 3)
    ms = 256
    occ_u8 = pack_occupancy_u8(
        occ, required_dilation_radius(8, cfg.grid_size, ms, cfg.scale),
        super_radius=required_dilation_radius(32, cfg.grid_size, ms,
                                              cfg.scale))
    ref = render_test_fast(params, cfg, occ_u8, o, d, max_samples=ms,
                           k=8, seg=8, n_segs=8, n_keep=4, bucket=64,
                           chunk=384, T_threshold=1e-4)
    # pool of chunk/16 = 8 rays per trip: a fixed 6-pass schedule could
    # touch at most 40 straggler rays; the drain keeps going until done
    got = render_test_oneshot(params, cfg, occ_u8, o, d, max_samples=ms,
                              k=16, n_keep=8, sup=4, n_keep_sup=8,
                              chunk=128, straggler_div=16, budget_div=0,
                              T_threshold=1e-4, drain=True,
                              max_passes=4096)
    starved = render_test_oneshot(params, cfg, occ_u8, o, d,
                                  max_samples=ms, k=16, n_keep=8, sup=4,
                                  n_keep_sup=8, chunk=128, passes=6,
                                  straggler_div=16, budget_div=0,
                                  T_threshold=1e-4)
    err = float(jnp.abs(got["rgb"] - ref["rgb"]).mean())
    erro = float(jnp.abs(got["opacity"] - ref["opacity"]).mean())
    assert err < 0.02, err
    assert erro < 0.03, erro
    # and the fixed schedule really is worse in this regime (sanity that
    # the test exercises the starvation case, not a trivial scene)
    err_starved = float(jnp.abs(starved["rgb"] - ref["rgb"]).mean())
    assert err_starved > err, (err_starved, err)


def test_oneshot_block2_matches_block():
    """The two-phase block marcher must render the same image as the
    one-phase block marcher (identical candidate lattice; super phase is
    a conservative superset)."""
    from google_nerf_tpu.ops.grid import pack_occupancy_blocks
    from google_nerf_tpu.ops.march_block import pack_occupancy_block2
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=32,
                    packed_log2_size=12, packed_levels=4)
    params = init_ngp(jax.random.PRNGKey(2), cfg)
    params["packed_table"] = params["packed_table"] * 2e3
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(24, 20))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    occ = jax.random.bernoulli(
        jax.random.PRNGKey(7), 0.10, (cfg.cascades,) + (cfg.grid_size,) * 3)
    ms = 256
    kw = dict(max_samples=ms, k=16, n_keep=8, chunk=480, passes=1,
              budget_div=0, straggler_div=2, drain=True, T_threshold=1e-4)
    ref = render_test_oneshot(params, cfg, pack_occupancy_blocks(occ), o, d,
                              march="block", **kw)
    got = render_test_oneshot(
        params, cfg, pack_occupancy_block2(occ, max_samples=ms,
                                           scale=cfg.scale), o, d,
        march="block2", **kw)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(ref["rgb"]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["opacity"]),
                               np.asarray(ref["opacity"]), rtol=1e-4,
                               atol=1e-4)


def test_oneshot_compact_main_matches():
    """compact_main (phase-A ray culling + drain-only rendering) must
    produce the same image as the dense main pass + drain."""
    from google_nerf_tpu.ops.march_block import pack_occupancy_block2
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=32,
                    packed_log2_size=12, packed_levels=4)
    params = init_ngp(jax.random.PRNGKey(4), cfg)
    params["packed_table"] = params["packed_table"] * 2e3
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(24, 20))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    occ = jax.random.bernoulli(
        jax.random.PRNGKey(8), 0.08, (cfg.cascades,) + (cfg.grid_size,) * 3)
    ms = 256
    occ2 = pack_occupancy_block2(occ, max_samples=ms, scale=cfg.scale)
    kw = dict(max_samples=ms, k=16, n_keep=8, chunk=480, budget_div=0,
              straggler_div=2, drain=True, T_threshold=1e-4, march="block2")
    ref = render_test_oneshot(params, cfg, occ2, o, d, **kw)
    got = render_test_oneshot(params, cfg, occ2, o, d, compact_main=True,
                              **kw)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(ref["rgb"]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got["opacity"]),
                               np.asarray(ref["opacity"]), rtol=1e-4,
                               atol=1e-4)
    # the cull must actually cull: alive-in count <= ray count, and
    # background-heavy frames leave most rays out of the drain
    assert int(got["alive_after_main"]) <= o.shape[0]


def test_drain_budget_pack_matches_dense():
    """Budget-packed drain trips (drain_budget_div > 0) must reproduce the
    dense-drain image: the budget only defers over-budget rays to a later
    trip (processed=False -> retry), it never changes their compositing."""
    from google_nerf_tpu.ops.march_block import pack_occupancy_block2
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=32,
                    packed_log2_size=12, packed_levels=4)
    params = init_ngp(jax.random.PRNGKey(4), cfg)
    params["packed_table"] = params["packed_table"] * 2e3
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(24, 20))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    occ = jax.random.bernoulli(
        jax.random.PRNGKey(8), 0.08, (cfg.cascades,) + (cfg.grid_size,) * 3)
    ms = 256
    occ2 = pack_occupancy_block2(occ, max_samples=ms, scale=cfg.scale)
    kw = dict(max_samples=ms, k=16, n_keep=8, chunk=480, budget_div=0,
              straggler_div=2, drain=True, T_threshold=1e-4, march="block2",
              compact_main=True)
    ref = render_test_oneshot(params, cfg, occ2, o, d, **kw)
    for div in (2, 8):
        got = render_test_oneshot(params, cfg, occ2, o, d,
                                  drain_budget_div=div, **kw)
        np.testing.assert_allclose(np.asarray(got["rgb"]),
                                   np.asarray(ref["rgb"]), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(got["opacity"]),
                                   np.asarray(ref["opacity"]), rtol=1e-4,
                                   atol=1e-4)
