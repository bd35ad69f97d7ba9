"""Mixed-resolution bake (models/baked_mixed.py): with merging disabled
the mixed path reproduces the plain fine bake exactly; with merging on,
coarse bricks replace fine children on a smooth field at small image
error and fewer bricks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from google_nerf_tpu.core.rays import get_ray_directions, get_rays
from google_nerf_tpu.models.baked import BakedConfig, bake
from google_nerf_tpu.models.baked_mixed import bake_mixed
from google_nerf_tpu.models.ngp import NGPConfig, init_ngp
from google_nerf_tpu.models.render_brick import brick_geometry
from google_nerf_tpu.models.render_brick_mxu import render_brick_mxu

CFG = NGPConfig(scale=0.5, encoder="packed", packed_log2_size=10,
                grid_size=16)


@pytest.fixture(scope="module")
def setup():
    params = init_ngp(jax.random.PRNGKey(0), CFG)
    # scale the random table up so the field has SOME spatial structure
    params["packed_table"] = params["packed_table"] * 2e3
    occ = np.zeros((CFG.cascades, 16, 16, 16), bool)
    occ[0, 4:10, 5:11, 6:12] = True     # a content blob
    occ = jnp.asarray(occ)
    W = H = 32
    K = jnp.asarray([[24.0, 0, W / 2], [0, 24.0, H / 2], [0, 0, 1]])
    dirs = get_ray_directions(H, W, K)
    pose = jnp.broadcast_to(
        jnp.asarray([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, -1.4]]),
        (H * W, 3, 4))
    o, d = get_rays(dirs, pose)
    return params, occ, o, d, W, H


def _render(baked, bcfg, geo, o, d, W, H):
    out = render_brick_mxu(baked, CFG, o, d, W, H, bcfg=bcfg,
                           geometry=geo, L=32, exact_cull=16,
                           kernel="tp", pbatch=4, bands=(),
                           segment_slots=8, drain_tiles=16, drain_L=32,
                           drain_xc=16, max_samples=64,
                           T_threshold=1e-2, chunk_tiles=16,
                           macro_tiles=0, macro_L=0)
    return out


def test_mixed_disabled_equals_fine(setup):
    params, occ, o, d, W, H = setup
    bcf = BakedConfig(voxel_res=32, block=8, dtype="float32")
    fine = bake(params, CFG, occ, bcf)
    geo_f = brick_geometry(fine["block_map"], bcf, CFG)
    ref = _render(fine, bcf, geo_f, o, d, W, H)

    baked, bcfg, geo, stats = bake_mixed(
        params, CFG, occ, vres_fine=32, vres_coarse=16, block=8,
        dtype="float32", tol_sigma=0.0, tol_feat=0.0)
    assert stats["n_coarse"] == 0
    assert stats["n_fine_kept"] == stats["n_fine_total"]
    got = _render(baked, bcfg, geo, o, d, W, H)
    np.testing.assert_allclose(np.asarray(got["rgb"]),
                               np.asarray(ref["rgb"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["depth"]),
                               np.asarray(ref["depth"]), atol=1e-4)


def test_mixed_merges_smooth_field(setup):
    params, occ, o, d, W, H = setup
    bcf = BakedConfig(voxel_res=32, block=8, dtype="float32")
    fine = bake(params, CFG, occ, bcf)
    geo_f = brick_geometry(fine["block_map"], bcf, CFG)
    ref = _render(fine, bcf, geo_f, o, d, W, H)

    baked, bcfg, geo, stats = bake_mixed(
        params, CFG, occ, vres_fine=32, vres_coarse=16, block=8,
        dtype="float32", tol_sigma=1e9, tol_feat=1e9)
    assert stats["n_coarse"] > 0, stats
    assert baked["n_blocks"] < stats["n_fine_total"], stats
    got = _render(baked, bcfg, geo, o, d, W, H)
    # infinite tolerance forces every mergeable brick coarse: the render
    # must still be a sane image of the same scene (finite, opacity in
    # range, gross agreement) — exactness is by the tol gates, tested on
    # the real scene by the chip ladder
    assert np.isfinite(np.asarray(got["rgb"])).all()
    assert float(jnp.abs(got["opacity"] - ref["opacity"]).mean()) < 0.2
    assert int(got["pairs_undrained"]) == 0


def test_mixed_tolerance_monotone(setup):
    """Tighter tolerances keep more fine bricks."""
    params, occ, o, d, W, H = setup
    n_blocks = []
    for tol in (1e9, 1e-6):
        baked, _, _, stats = bake_mixed(
            params, CFG, occ, vres_fine=32, vres_coarse=16, block=8,
            dtype="float32", tol_sigma=tol, tol_feat=tol)
        n_blocks.append(baked["n_blocks"])
    assert n_blocks[0] <= n_blocks[1]
