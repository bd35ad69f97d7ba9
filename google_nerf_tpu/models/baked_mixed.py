"""Mixed-resolution baked brick field — the serving slot diet.

The MXU serving frame law is wall ~= c x (tile, brick-slot) grid steps
(DESIGN_NOTES R4.5), so slot count is the dominant FPS lever: the 512^3
bake renders at ~200k slots (1.7 FPS), the 256^3 bake at ~51k (3.4 FPS)
but pays a quality discount wherever the field has sub-voxel detail.
This module bakes BOTH resolutions and keeps the coarse brick exactly
where it is measured to reproduce the fine bake, cutting slots at ~zero
quality cost:

  * bake fine (e.g. 512^3 lattice, 8^3-voxel bricks) and coarse (256^3)
    with models/baked.bake;
  * for every fine brick, probe the two baked fields at the brick's
    voxel centers and record the max sigma / max feature deviation of
    the coarse field from the fine one;
  * a coarse brick replaces its (up to 8) fine children iff every
    existing child passes both tolerances; all other fine bricks stay;
  * emit one pool + one (lo, hi) geometry of mixed-size bricks.

The downstream pipeline needs NO other changes: the cone cull and exact
hit filter already work on per-brick AABBs with per-brick radii, and the
round-5 kernels map samples onto each brick's own Bk^3 lattice from its
meta AABB (ops/pallas/brick_field.py).  Exactness accounting (drain /
undrained telemetry) is unchanged.

Reference analog: none — the reference's 36 FPS rides CUDA-speed
gathers (`ngp_pl/test.py:30-45`); this is the TPU-native route to the
same headline (see models/baked.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.models.baked import BakedConfig, bake, baked_field
from google_nerf_tpu.models.ngp import NGPConfig
from google_nerf_tpu.models.render_brick import brick_geometry


def _fine_brick_errors(fine, coarse, cfg: NGPConfig, bcf: BakedConfig,
                      bcc: BakedConfig, lof, hif, chunk_bricks: int = 2048):
    """Per fine brick: max |sigma_c - sigma_f| and max |h_c - h_f| over
    the brick's Bk^3 voxel centers (h channels 1:, the rgb-MLP inputs).
    Returns (err_sig (Nf,), err_feat (Nf,)) numpy."""
    Bk = bcf.block
    Nf = lof.shape[0]
    cg = jnp.arange(Bk, dtype=jnp.float32) + 0.5
    grid = jnp.stack(jnp.meshgrid(cg, cg, cg, indexing="ij"),
                     -1).reshape(-1, 3) / Bk                 # (Bk^3, 3) in
    #                                                          brick units

    # fine/coarse are jit ARGUMENTS: closing over them captures both
    # pools as compile-time constants (~GBs lowered into the program —
    # ResourceExhausted on chip)
    @jax.jit
    def chunk_err(fine, coarse, lo_c, hi_c):
        pts = (lo_c[:, None, :]
               + grid[None] * (hi_c - lo_c)[:, None, :]).reshape(-1, 3)
        sf, hf = baked_field(fine, cfg, bcf, pts)
        sc, hc = baked_field(coarse, cfg, bcc, pts)
        es = jnp.abs(sc - sf).reshape(-1, Bk ** 3).max(1)
        ef = jnp.abs(hc[:, 1:] - hf[:, 1:]).max(-1).reshape(
            -1, Bk ** 3).max(1)
        return es, ef

    es_all, ef_all = [], []
    pad = (-Nf) % chunk_bricks
    lo_p = jnp.concatenate([lof, jnp.zeros((pad, 3))]) if pad else lof
    hi_p = jnp.concatenate([hif, jnp.ones((pad, 3))]) if pad else hif
    for i in range(0, Nf + pad, chunk_bricks):
        es, ef = chunk_err(fine, coarse, lo_p[i:i + chunk_bricks],
                           hi_p[i:i + chunk_bricks])
        es_all.append(np.asarray(es))
        ef_all.append(np.asarray(ef))
    return (np.concatenate(es_all)[:Nf], np.concatenate(ef_all)[:Nf])


def bake_mixed(params, cfg: NGPConfig, occ, *, vres_fine: int = 512,
               vres_coarse: int = 256, block: int = 8,
               dtype: str = "bfloat16", tol_sigma: float = 2.0,
               tol_feat: float = 0.25, fine=None, coarse=None):
    """Bake a mixed-resolution brick field.

    tol_sigma: max |sigma| deviation (density units; alpha error per
    serving step ~ tol_sigma * dt with dt = sqrt(3)/max_samples).
    tol_feat: max deviation of the 15 rgb-MLP feature channels.
    tol_* <= 0 disables merging (pure fine bake through the mixed path).

    Returns (baked, bcfg, geometry, stats):
      baked:    dict(pool (Nm*Bk^3, 8F), rgb_mlp, n_blocks) — brick i's
                slab = pool rows [i*Bk^3, (i+1)*Bk^3)
      bcfg:     BakedConfig with voxel_res = vres_coarse (the COARSEST
                level, so window_span sizes S for the widest brick)
      geometry: (lo, hi, pool_base) mixed-size brick AABBs, renderer-ready
      stats:    dict(n_fine_total, n_fine_kept, n_coarse, slots_saved_frac)
    """
    assert vres_fine % vres_coarse == 0 and vres_fine // vres_coarse == 2, \
        "one octave per merge step (fine = 2 x coarse)"
    bcf = BakedConfig(voxel_res=vres_fine, block=block, dtype=dtype)
    bcc = BakedConfig(voxel_res=vres_coarse, block=block, dtype=dtype)
    # callers that already hold the bakes (bench.py's 512/256 stages)
    # pass them in; a fresh 512^3 bake costs ~60 s warm on chip
    if fine is None:
        fine = bake(params, cfg, occ, bcf)
    if coarse is None:
        coarse = bake(params, cfg, occ, bcc)
    lof, hif, _ = brick_geometry(fine["block_map"], bcf, cfg)
    loc, hic, _ = brick_geometry(coarse["block_map"], bcc, cfg)
    Nf, Nc = lof.shape[0], loc.shape[0]
    Bk = block
    vox = Bk ** 3

    merge = np.zeros((Nf,), bool)
    sel_c = np.zeros((0,), np.int64)
    err_pct = None
    if tol_sigma > 0 and tol_feat > 0 and Nc:
        es, ef = _fine_brick_errors(fine, coarse, cfg, bcf, bcc, lof, hif)
        ok_f = (es <= tol_sigma) & (ef <= tol_feat)          # (Nf,)
        q = [10, 25, 50, 75, 90]
        err_pct = dict(sigma=[round(float(v), 3)
                              for v in np.percentile(es, q)],
                       feat=[round(float(v), 3)
                             for v in np.percentile(ef, q)])

        # map fine bricks -> parent coarse brick (pool order on both
        # sides via the block grids)
        Gbf, Gbc = bcf.block_res, bcc.block_res
        bmf = np.asarray(fine["block_map"])
        bmc = np.asarray(coarse["block_map"])
        fin_ids = np.flatnonzero(bmf >= 0)
        fin_ids = fin_ids[np.argsort(bmf[fin_ids])]          # pool order
        fx, fy, fz = (fin_ids // (Gbf * Gbf), (fin_ids // Gbf) % Gbf,
                      fin_ids % Gbf)
        parent_blk = ((fx // 2) * Gbc + (fy // 2)) * Gbc + (fz // 2)
        parent_pool = bmc[parent_blk]                        # (Nf,) or -1

        # a coarse brick merges iff it exists and ALL its existing fine
        # children pass both tolerances
        ok_per_c = np.ones((Nc,), bool)
        has_child = np.zeros((Nc,), bool)
        valid = parent_pool >= 0
        np.logical_and.at(ok_per_c, parent_pool[valid], ok_f[valid])
        has_child[parent_pool[valid]] = True
        mergeable_c = ok_per_c & has_child
        merge = valid & mergeable_c[np.clip(parent_pool, 0, Nc - 1)]
        sel_c = np.flatnonzero(mergeable_c)

    sel_f = np.flatnonzero(~merge)
    # Pool assembly stays ON DEVICE (np.asarray round-trips GBs through
    # the host relay, ~200 s measured) but is SEQUENCED for peak HBM:
    # usable memory through the relay is well under the nominal chip
    # capacity (the naive take+concat OOMed solo, r5 bench pass 3-4), so
    # each source pool is dropped the moment its rows are extracted.
    # Callers should pass OWNING references (not keep their own).
    lo = jnp.concatenate([lof[sel_f], loc[sel_c]]) if len(sel_c) \
        else lof[jnp.asarray(sel_f)]
    hi = jnp.concatenate([hif[sel_f], hic[sel_c]]) if len(sel_c) \
        else hif[jnp.asarray(sel_f)]
    cpart = None
    if len(sel_c):
        cpart = jnp.take(coarse["pool"].reshape(
            Nc, vox * 8 * bcc.feat_dim),
            jnp.asarray(sel_c, jnp.int32), axis=0)
        cpart.block_until_ready()
    coarse.pop("pool", None)
    fpart = jnp.take(fine["pool"].reshape(Nf, vox * 8 * bcf.feat_dim),
                     jnp.asarray(sel_f, jnp.int32), axis=0)
    fpart.block_until_ready()
    rgb_mlp = fine["rgb_mlp"]
    fine.pop("pool", None)
    pool = jnp.concatenate([fpart, cpart]) if cpart is not None else fpart
    pool.block_until_ready()
    del fpart, cpart
    n_blocks = int(pool.shape[0])
    baked = dict(
        pool=pool.reshape(n_blocks * vox, -1),
        rgb_mlp=rgb_mlp,
        n_blocks=n_blocks,
    )
    pool_base = jnp.arange(n_blocks, dtype=jnp.int32) * vox
    stats = dict(n_fine_total=int(Nf), n_fine_kept=int(len(sel_f)),
                 n_coarse=int(len(sel_c)),
                 bricks_saved_frac=round(1.0 - n_blocks / max(Nf, 1), 3),
                 err_pct=err_pct)
    return baked, bcc, (lo, hi, pool_base), stats


def pad_bricks(baked, geo, mult: int = 4096):
    """Pad the brick count to a `mult` bucket with far-away never-culled
    dummy bricks, so nearby tolerances / train states share ONE compiled
    frame program (brick count is a static shape in the renderer; a
    fresh count costs a full compile-service round trip)."""
    lo, hi, _ = geo
    n = baked["n_blocks"]
    vox = baked["pool"].shape[0] // n
    npad = (-n) % mult
    if npad == 0:
        return baked, geo
    pool = jnp.concatenate([
        baked["pool"],
        jnp.zeros((npad * vox, baked["pool"].shape[1]),
                  baked["pool"].dtype)])
    far = jnp.full((npad, 3), 1e6, lo.dtype)
    geo2 = (jnp.concatenate([lo, far]),
            jnp.concatenate([hi, far + 1e-3]),
            jnp.arange(n + npad, dtype=jnp.int32) * vox)
    b2 = dict(baked)
    b2["pool"] = pool
    b2["n_blocks"] = n + npad
    b2.pop("poolT", None)
    return b2, geo2
