"""Baked sparse-voxel field: exactness at voxel corners, trilerp between,
and the baked renderer approximating the live renderer.
"""
import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.core.rays import get_rays
from google_nerf_tpu.data.synthetic import SyntheticDataset
from google_nerf_tpu.models.baked import (BakedConfig, bake,
                                          baked_extent, baked_field,
                                          render_test_baked)
from google_nerf_tpu.models.ngp import NGPConfig, init_ngp, ngp_density
from google_nerf_tpu.models.render_test_fast import render_test_fast
from google_nerf_tpu.ops.grid import pack_occupancy_u8


def _setup():
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=16,
                    packed_log2_size=12, packed_levels=4)
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    # grow the table so the field is non-trivial
    params["packed_table"] = params["packed_table"] * 1e3
    occ = jnp.ones((cfg.cascades,) + (cfg.grid_size,) * 3, bool)
    bcfg = BakedConfig(voxel_res=32, block=4)
    baked = bake(params, cfg, occ, bcfg)
    return cfg, params, occ, bcfg, baked


def test_baked_exact_at_corners_and_trilerp_between():
    cfg, params, occ, bcfg, baked = _setup()
    s = baked_extent(cfg)
    V = bcfg.voxel_res
    # voxel-corner positions: baked value == live field value exactly
    ij = np.array([[3, 5, 7], [0, 0, 0], [31, 31, 31], [16, 8, 24]])
    xyz = jnp.asarray((ij / V * 2.0 - 1.0) * s, jnp.float32)
    sig_b, h_b = baked_field(baked, cfg, bcfg, xyz)
    sig_l, h_l = ngp_density(params, cfg, xyz, return_feat=True)
    np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_l),
                               rtol=0.02, atol=0.02)  # bf16 pool storage
    # mid-voxel positions: baked = trilerp of the 8 corner field values
    mid = jnp.asarray(((ij + 0.5) / V * 2.0 - 1.0) * s, jnp.float32)
    _, h_mid = baked_field(baked, cfg, bcfg, mid)
    corners = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                   indexing="ij"), -1).reshape(8, 3)
    pts = jnp.asarray(((ij[:, None] + corners[None]) / V * 2.0 - 1.0) * s,
                      jnp.float32).reshape(-1, 3)
    _, h_c = ngp_density(params, cfg, pts, return_feat=True)
    h_ref = np.asarray(h_c).reshape(len(ij), 8, -1).mean(1)
    np.testing.assert_allclose(np.asarray(h_mid), h_ref, rtol=0.05,
                               atol=0.05)


def test_baked_renderer_matches_live():
    cfg, params, occ, bcfg, baked = _setup()
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(16, 16))
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    occ_u8 = pack_occupancy_u8(occ, 2, super_radius=5)
    kw = dict(k=8, seg=8, n_segs=8, n_keep=4, max_samples=64,
              bucket=64, chunk=256)
    live = render_test_fast(params, cfg, occ_u8, o, d, **kw)
    bk = render_test_baked(baked, cfg, occ_u8, o, d, bcfg=bcfg, **kw)
    # baked is an approximation (voxel trilerp of a smooth-ish random
    # field): images must agree closely in the mean
    err = float(jnp.abs(bk["rgb"] - live["rgb"]).mean())
    assert err < 0.05, err


def test_save_load_baked_roundtrip(tmp_path):
    """save_baked/load_baked: the deployable .npz artifact reproduces the
    bake bit-for-bit for bf16 and fp8 pools (ml_dtypes round-trip through
    npz as raw bytes + a dtype tag)."""
    from google_nerf_tpu.models.baked import load_baked, save_baked
    cfg, params, occ, bcfg0, _ = _setup()
    for dtype in ("bfloat16", "float8_e4m3fn"):
        bcfg = BakedConfig(voxel_res=bcfg0.voxel_res, block=bcfg0.block,
                           dtype=dtype)
        baked = bake(params, cfg, occ, bcfg)
        p = str(tmp_path / f"bake_{dtype}.npz")
        save_baked(p, baked, bcfg)
        got, gcfg = load_baked(p)
        assert gcfg == bcfg
        assert got["n_blocks"] == baked["n_blocks"]
        assert got["pool"].dtype == baked["pool"].dtype
        np.testing.assert_array_equal(
            np.asarray(got["pool"]).view(np.uint8),
            np.asarray(baked["pool"]).view(np.uint8))
        np.testing.assert_array_equal(np.asarray(got["block_map"]),
                                      np.asarray(baked["block_map"]))
        for a, b in zip(got["rgb_mlp"], baked["rgb_mlp"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bake_alignment_scale_above_half():
    """Regression: for 0.5 < scale <= 1 the baked grid must span the
    cascade-0 occupancy bound min(0.5, scale), not min(1, scale) — the old
    mapping stretched occ[0] over [-1, 1], so sparse occupancy selected
    blocks at 2x the world position and sigma-gated the true content."""
    cfg = NGPConfig(scale=1.0, encoder="packed", grid_size=16,
                    packed_log2_size=12, packed_levels=4)
    assert cfg.cascades >= 2
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    params["packed_table"] = params["packed_table"] * 1e3
    # occupy only the cascade-0 cell containing p = (0.25, 0.25, 0.25):
    # cell = ((p / 0.5) * 0.5 + 0.5) * 16 = 12
    occ = np.zeros((cfg.cascades,) + (cfg.grid_size,) * 3, bool)
    occ[0, 12, 12, 12] = True
    bcfg = BakedConfig(voxel_res=32, block=4)
    baked = bake(params, cfg, jnp.asarray(occ), bcfg)
    # p sits exactly on voxel corner 24 of the [-0.5, 0.5] baked grid
    p = jnp.asarray([[0.25, 0.25, 0.25]], jnp.float32)
    sig_b, h_b = baked_field(baked, cfg, bcfg, p)
    sig_l, _ = ngp_density(params, cfg, p, return_feat=True)
    np.testing.assert_allclose(np.asarray(sig_b), np.asarray(sig_l),
                               rtol=0.05, atol=1e-3)
    # a point in an EMPTY occupancy cell (far corner) must be gated off
    q = jnp.asarray([[-0.4, -0.4, -0.4]], jnp.float32)
    sig_q, _ = baked_field(baked, cfg, bcfg, q)
    assert float(sig_q[0]) < 1e-3


def test_bake_dilation_does_not_wrap():
    """Regression: the 1-cell trilerp-support dilation must not wrap
    around the volume (np.roll): content at one face must not allocate
    pool blocks at the opposite face."""
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=16,
                    packed_log2_size=12, packed_levels=4)
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    occ = np.zeros((cfg.cascades,) + (cfg.grid_size,) * 3, bool)
    occ[0, 0, 8, 8] = True          # on the x=0 face
    bcfg = BakedConfig(voxel_res=32, block=4)
    baked = bake(params, cfg, jnp.asarray(occ), bcfg)
    Gb = bcfg.block_res
    bm = np.asarray(baked["block_map"]).reshape(Gb, Gb, Gb)
    assert (bm[0] >= 0).any()       # content face baked
    assert (bm[-1] < 0).all()       # opposite face must stay empty
