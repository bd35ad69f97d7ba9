import pytest
"""Tile-rasterized brick renderer: conservative culling, zero-cost
background rays, and agreement with the march-based baked renderer on the
same serving lattice."""
import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.core.rays import get_rays
from google_nerf_tpu.data.synthetic import SyntheticDataset
from google_nerf_tpu.models.baked import (BakedConfig, bake,
                                          render_test_baked)
from google_nerf_tpu.models.ngp import NGPConfig, init_ngp
from google_nerf_tpu.models.render_brick import (brick_geometry,
                                                 render_brick, tile_order)
from google_nerf_tpu.ops.grid import pack_occupancy_u8
from google_nerf_tpu.ops.ray_aabb import ray_aabb_intersect


def _setup():
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=16,
                    packed_log2_size=12, packed_levels=4)
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    params["packed_table"] = params["packed_table"] * 1e3
    occ = jnp.ones((cfg.cascades,) + (cfg.grid_size,) * 3, bool)
    bcfg = BakedConfig(voxel_res=32, block=4)
    baked = bake(params, cfg, occ, bcfg)
    return cfg, params, occ, bcfg, baked


def test_tile_order_is_permutation():
    perm, inv = tile_order(16, 8, 4)
    assert np.array_equal(np.sort(perm), np.arange(16 * 8))
    assert np.array_equal(perm[inv], np.arange(16 * 8))
    # first tile = top-left 4x4 block of the row-major image
    expect = (np.arange(4)[:, None] * 16 + np.arange(4)[None]).reshape(-1)
    assert np.array_equal(perm[:16], expect)


@pytest.mark.slow
def test_cone_cull_is_conservative():
    """Every brick a ray hits must be in that ray's tile list."""
    cfg, params, occ, bcfg, baked = _setup()
    lo, hi, base = brick_geometry(baked["block_map"], bcfg, cfg)
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(16, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    du = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    from google_nerf_tpu.models.render_brick import (_tile_cones,
                                                     _tile_lists)
    tile = 8
    perm, _ = tile_order(16, 16, tile)
    o_t = jnp.take(o, jnp.asarray(perm), axis=0)
    d_t = jnp.take(du, jnp.asarray(perm), axis=0)
    T = (16 * 16) // (tile * tile)
    oc, ax, th = _tile_cones(o_t, d_t, T, tile * tile)
    Nb = lo.shape[0]
    bidx, n_rel = _tile_lists(lo, hi, oc, ax, th,
                              jnp.full((T,), 10.0), L=Nb)
    # r4: the second return is the true-relevant COUNT (band scheduling
    # + drain triggers compare it against capacity); at L=Nb no tile's
    # relevant set can exceed the list capacity
    assert not bool((n_rel > Nb).any())
    in_list = np.zeros((T, Nb), bool)
    bn = np.asarray(bidx)
    for t in range(T):
        in_list[t, bn[t][bn[t] >= 0]] = True
    # exact per-ray hit test vs each brick
    on, dn = np.asarray(o_t), np.asarray(d_t)
    for t in range(T):
        for r in range(t * 64, (t + 1) * 64, 17):  # subsample rays
            for b in range(0, Nb, 7):              # subsample bricks
                c = (np.asarray(lo[b]) + np.asarray(hi[b])) / 2
                half = (np.asarray(hi[b]) - np.asarray(lo[b])) / 2
                h = ray_aabb_intersect(o_t[r:r + 1], d_t[r:r + 1],
                                       jnp.asarray(c), jnp.asarray(half))
                if float(h[0, 1]) > 0:
                    assert in_list[t, b], (t, r, b)


@pytest.mark.slow
def test_brick_matches_baked_march_renderer():
    cfg, params, occ, bcfg, baked = _setup()
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(16, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    occ_u8 = pack_occupancy_u8(occ, 2, super_radius=5)
    live = render_test_baked(baked, cfg, occ_u8, o, d, bcfg=bcfg,
                             k=8, seg=8, n_segs=8, n_keep=4,
                             max_samples=64, bucket=64, chunk=256)
    geo = brick_geometry(baked["block_map"], bcfg, cfg)
    out = render_brick(baked, cfg, o, d, 16, 16, bcfg=bcfg, tile=8,
                       L=geo[0].shape[0], Lk=32, max_samples=64,
                       pairs_per_ray=32.0, geometry=geo)
    assert int(out["trunc_tiles"]) == 0
    assert int(out["trunc_rays"]) == 0
    assert int(out["pairs_dropped"]) == 0
    err = float(jnp.abs(out["rgb"] - live["rgb"]).mean())
    assert err < 0.05, err
    # depth/opacity in the same ballpark too
    assert float(jnp.abs(out["opacity"] - live["opacity"]).mean()) < 0.05


def test_brick_matches_march_on_sparse_occupancy():
    """Production-shaped scene: sparse occupancy -> empty blocks in the
    block_map, real background rays, bricks covering ~20%% of the volume.
    Brick raster and baked march must still agree."""
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=16,
                    packed_log2_size=12, packed_levels=4)
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    params["packed_table"] = params["packed_table"] * 1e3
    # each 4^3-voxel block overlaps 2^3 occupancy cells + 1-cell dilation,
    # so p must be tiny for empty blocks to actually exist
    occ = jax.random.bernoulli(
        jax.random.PRNGKey(7), 0.01,
        (cfg.cascades,) + (cfg.grid_size,) * 3)
    bcfg = BakedConfig(voxel_res=32, block=4)
    baked = bake(params, cfg, occ, bcfg)
    assert baked["n_blocks"] < bcfg.block_res ** 3   # genuinely sparse
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(16, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    occ_u8 = pack_occupancy_u8(occ, 2, super_radius=5)
    # sparse blobs split each ray into MANY disjoint segments: the march
    # needs real capacity (n_keep) or IT becomes the lossy side
    live = render_test_baked(baked, cfg, occ_u8, o, d, bcfg=bcfg,
                             k=32, seg=8, n_segs=32, n_keep=32,
                             max_samples=64, bucket=64, chunk=256)
    geo = brick_geometry(baked["block_map"], bcfg, cfg)
    out = render_brick(baked, cfg, o, d, 16, 16, bcfg=bcfg, tile=8,
                       L=geo[0].shape[0], Lk=32, max_samples=64,
                       pairs_per_ray=32.0, geometry=geo)
    assert int(out["pairs_dropped"]) == 0
    err = float(jnp.abs(out["rgb"] - live["rgb"]).mean())
    assert err < 0.05, err
    assert float(jnp.abs(out["opacity"] - live["opacity"]).mean()) < 0.05


def test_non_tile_multiple_image_is_padded_and_cropped():
    """W/H not divisible by tile: edge-padded internally, output cropped
    to W*H and identical to the tile-multiple render of the same rays."""
    cfg, params, occ, bcfg, baked = _setup()
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(16, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    geo = brick_geometry(baked["block_map"], bcfg, cfg)
    kw = dict(bcfg=bcfg, tile=8, L=geo[0].shape[0], Lk=16,
              max_samples=64, pairs_per_ray=16.0, geometry=geo)
    full = render_brick(baked, cfg, o, d, 16, 16, **kw)
    # crop the ray grid to 13 x 11 (neither a multiple of 8)
    sel = (np.arange(11)[:, None] * 16 + np.arange(13)[None]).reshape(-1)
    crop = render_brick(baked, cfg, o[sel], d[sel], 13, 11, **kw)
    assert crop["rgb"].shape == (13 * 11, 3)
    want = np.asarray(full["rgb"]).reshape(16, 16, 3)[:11, :13].reshape(-1, 3)
    np.testing.assert_allclose(np.asarray(crop["rgb"]), want,
                               atol=2e-2, rtol=0)


def test_chunking_is_invariant_and_never_inflates():
    """Multi-chunk render (with a padded partial last chunk) matches the
    single-chunk render exactly; and a chunk_tiles far above the tile
    count must NOT inflate the compiled shape (regression: a 64-tile
    frame padded up to chunk_tiles=2048 rendered 32x the rays)."""
    cfg, params, occ, bcfg, baked = _setup()
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(16, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    geo = brick_geometry(baked["block_map"], bcfg, cfg)
    kw = dict(bcfg=bcfg, tile=8, L=geo[0].shape[0], Lk=8,
              max_samples=64, pairs_per_ray=8.0, geometry=geo)
    big = render_brick(baked, cfg, o, d, 16, 16, chunk_tiles=10 ** 6, **kw)
    multi = render_brick(baked, cfg, o, d, 16, 16, chunk_tiles=3, **kw)
    np.testing.assert_allclose(np.asarray(multi["rgb"]),
                               np.asarray(big["rgb"]), atol=1e-4, rtol=0)
    # the clamp: huge chunk_tiles compiles at the true 4-tile shape, so
    # its pair budget (cpr * tpx * ppr) stays at the 4-tile size
    assert int(big["pairs_dropped"]) == 0


def test_multipass_matches_single_pass():
    """Sequential early-termination passes (ample budgets, one pair per
    ray per pass) reproduce the single-pass packed render exactly — the
    composites are the same math in the same order."""
    cfg, params, occ, bcfg, baked = _setup()
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(16, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    geo = brick_geometry(baked["block_map"], bcfg, cfg)
    kw = dict(bcfg=bcfg, tile=8, L=geo[0].shape[0], Lk=8,
              max_samples=64, geometry=geo)
    one = render_brick(baked, cfg, o, d, 16, 16, pairs_per_ray=8.0, **kw)
    multi = render_brick(baked, cfg, o, d, 16, 16,
                         pass_fracs=(1.0,) * 8, **kw)
    np.testing.assert_allclose(np.asarray(multi["rgb"]),
                               np.asarray(one["rgb"]), atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(multi["opacity"]),
                               np.asarray(one["opacity"]), atol=1e-4,
                               rtol=0)
    assert int(multi["pairs_dropped"]) == 0


def test_short_pass_list_drains_exactly():
    """pass_fracs shorter than the per-ray pair budget: the trailing
    drain pass must render every remaining pair, reproducing the
    single-pass packed render exactly.  (Regression: without the drain,
    rays outliving the pass list kept unrendered content — measured
    -5 dB on the smoke scene.)"""
    cfg, params, occ, bcfg, baked = _setup()
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(16, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    geo = brick_geometry(baked["block_map"], bcfg, cfg)
    kw = dict(bcfg=bcfg, tile=8, L=geo[0].shape[0], Lk=8,
              max_samples=64, geometry=geo)
    one = render_brick(baked, cfg, o, d, 16, 16, pairs_per_ray=8.0, **kw)
    short = render_brick(baked, cfg, o, d, 16, 16, pass_fracs=(1.0, 1.0),
                         drain_frac=6.0, **kw)
    np.testing.assert_allclose(np.asarray(short["rgb"]),
                               np.asarray(one["rgb"]), atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(short["opacity"]),
                               np.asarray(one["opacity"]), atol=1e-4,
                               rtol=0)
    assert int(short["pairs_dropped"]) == 0
    # trunc_rays counts the shared Lk-selection overflow (every ray here
    # crosses > Lk bricks in the all-occupied test cube); the drain path
    # must not ADD truncations beyond the single-pass render's
    assert int(short["trunc_rays"]) == int(one["trunc_rays"])


def test_tile_list_overflow_keeps_in_cone_bricks():
    """Under L overflow, bricks whose center lies INSIDE the exact tile
    cone (near-certain hits) must survive selection ahead of nearer
    margin-zone bricks (cull slack).  Regression for the smoke-scene
    -4 dB loss where margin bricks flooded the nearest-L list."""
    from google_nerf_tpu.models.render_brick import _tile_lists
    o = jnp.zeros((1, 3))
    axis = jnp.asarray([[0.0, 0.0, 1.0]])
    tan_half = jnp.asarray([0.05])
    edge = 0.04
    # 1 content brick on the axis at t=2 (center in cone), 8 nearer
    # margin bricks ringed just OUTSIDE the exact cone at t=1
    centers = [(0.0, 0.0, 2.0)]
    r_ring = 1.0 * 0.05 + edge * 0.8   # outside lim0, inside lim margin
    for k in range(8):
        a = 2 * np.pi * k / 8
        centers.append((r_ring * np.cos(a), r_ring * np.sin(a), 1.0))
    c = jnp.asarray(centers, jnp.float32)
    lo = c - edge / 2
    hi = c + edge / 2
    bidx, over = _tile_lists(lo, hi, o, axis, tan_half,
                             jnp.asarray([10.0]), L=4)
    assert bool(over[0])               # 9 relevant > L=4
    kept = set(np.asarray(bidx[0]).tolist())
    assert 0 in kept, kept             # the in-cone content brick survives
    """float8_e4m3fn pool (half the gather bytes — the serving renderers'
    dominant cost) stays close to the bf16 pool render."""
    cfg, params, occ, bcfg, baked = _setup()
    bcfg8 = BakedConfig(voxel_res=32, block=4, dtype="float8_e4m3fn")
    baked8 = bake(params, cfg, occ, bcfg8)
    assert baked8["pool"].dtype == jnp.float8_e4m3fn
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(16, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    geo = brick_geometry(baked["block_map"], bcfg, cfg)
    kw = dict(tile=8, L=geo[0].shape[0], Lk=16, max_samples=64,
              pairs_per_ray=16.0, geometry=geo)
    ref = render_brick(baked, cfg, o, d, 16, 16, bcfg=bcfg, **kw)
    out = render_brick(baked8, cfg, o, d, 16, 16, bcfg=bcfg8, **kw)
    err = float(jnp.abs(out["rgb"] - ref["rgb"]).mean())
    assert err < 0.03, err


def test_pass_budget_deferral_is_exact():
    """A ray that misses a pass's packing budget retries via its cursor
    (and ultimately the drain) — tight per-pass budgets must reproduce
    the single-pass render exactly, never drop or double-render a pair."""
    cfg, params, occ, bcfg, baked = _setup()
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(16, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    geo = brick_geometry(baked["block_map"], bcfg, cfg)
    kw = dict(bcfg=bcfg, tile=8, L=geo[0].shape[0], Lk=8,
              max_samples=64, geometry=geo)
    one = render_brick(baked, cfg, o, d, 16, 16, pairs_per_ray=8.0, **kw)
    tight = render_brick(baked, cfg, o, d, 16, 16,
                         pass_fracs=(0.07, 0.07, 0.07), drain_frac=8.0,
                         **kw)
    np.testing.assert_allclose(np.asarray(tight["rgb"]),
                               np.asarray(one["rgb"]), atol=1e-4, rtol=0)
    assert int(tight["pairs_dropped"]) == 0


def test_budget_pressure_degrades_gracefully():
    """Under pairs-budget pressure the packing is sample-major: every ray
    keeps its NEAR windows and only far tails drop.  (Regression:
    ray-major packing starved whole trailing tiles — the object vanished
    from the image center at -8.5 dB while telemetry read '1'.)"""
    cfg, params, occ, bcfg, baked = _setup()
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(16, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    geo = brick_geometry(baked["block_map"], bcfg, cfg)
    # uniform-density pool: every window contributes tau > 0, so keeping
    # the front window guarantees visible opacity (the random test field
    # can have a genuinely empty first window)
    F = bcfg.feat_dim
    baked = dict(baked, pool=baked["pool"].at[:, 0::F].set(2.0))
    kw = dict(bcfg=bcfg, tile=8, L=geo[0].shape[0], Lk=8,
              max_samples=64, geometry=geo)
    ample = render_brick(baked, cfg, o, d, 16, 16, pairs_per_ray=8.0, **kw)
    tight = render_brick(baked, cfg, o, d, 16, 16, pairs_per_ray=1.0, **kw)
    assert int(tight["pairs_dropped"]) > 0       # a real count now
    content = np.asarray(ample["opacity"]) > 0.5
    assert content.sum() > 50
    # every content ray keeps its front window -> visible opacity
    assert (np.asarray(tight["opacity"])[content] > 0.1).all()


def test_hierarchical_cull_matches_single_level():
    """Macro-cull + per-tile refine == single-level cull when the macro
    candidate list is ample: every brick a ray hits passes the macro
    relevance test (it lies within r_b of a ray inside the macro cone),
    so with no Lm overflow the refined lists select identical content."""
    cfg, params, occ, bcfg, baked = _setup()
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(16, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    geo = brick_geometry(baked["block_map"], bcfg, cfg)
    nb = geo[0].shape[0]
    kw = dict(bcfg=bcfg, tile=8, L=nb, Lk=8, max_samples=64,
              pairs_per_ray=8.0, geometry=geo)
    flat = render_brick(baked, cfg, o, d, 16, 16, macro_tiles=0, **kw)
    # macro_L = n_bricks: the macro stage is lossless but the two-level
    # code path (macro cull + gathered per-tile refine) fully engages;
    # the macro groups are 2 tiles here (4 tiles per frame)
    hier = render_brick(baked, cfg, o, d, 16, 16, macro_tiles=2,
                        macro_L=nb, **kw)
    assert int(hier["trunc_tiles"]) == 0        # no macro/tile overflow
    for k in ("rgb", "opacity", "depth"):
        np.testing.assert_allclose(np.asarray(hier[k]),
                                   np.asarray(flat[k]), atol=1e-5,
                                   err_msg=k)


def test_dp_brick_matches_serial():
    """Mesh-sharded brick serving (tiles block-sharded over devices)
    reproduces the single-device render exactly — tiles are independent,
    so the only DP effects are budget sizing and padding, both benign
    with ample budgets."""
    from google_nerf_tpu.parallel.dp import make_mesh, render_brick_dp
    cfg, params, occ, bcfg, baked = _setup()
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(16, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    geo = brick_geometry(baked["block_map"], bcfg, cfg)
    kw = dict(bcfg=bcfg, tile=8, L=geo[0].shape[0], Lk=8,
              max_samples=64, pairs_per_ray=8.0, geometry=geo)
    ref = render_brick(baked, cfg, o, d, 16, 16, **kw)
    # 4 tiles over a 3-device mesh: exercises the tile-count pad too
    got = render_brick_dp(baked, cfg, o, d, 16, 16, make_mesh(3), **kw)
    for k in ("rgb", "opacity", "depth"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=1e-5, err_msg=k)
    assert int(got["pairs_dropped"]) == 0


def test_background_rays_render_background():
    cfg, params, occ, bcfg, baked = _setup()
    # rays pointing away from the scene box
    R = 64
    o = jnp.tile(jnp.asarray([[2.0, 0.0, 0.0]]), (R, 1))
    d = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (R, 1))
    out = render_brick(baked, cfg, o, d, 8, 8, bcfg=bcfg, tile=8,
                       Lk=8, L=16, max_samples=64)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["opacity"]), 0.0, atol=1e-6)
