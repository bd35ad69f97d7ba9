"""Tile-rasterized brick renderer with the MXU field kernel.

Same raster front-end as models/render_brick.py (cone cull -> per-tile
front-to-back brick lists), but the per-sample pool GATHER — the measured
<1 FPS wall of the XLA brick renderer (DESIGN_NOTES round 7 gather law) —
is replaced by ops/pallas/brick_field.brick_field_tiles: one slab DMA +
one-hot trilerp matmuls per (tile, brick), with in-kernel compositing and
brick-granular early ray termination.

Differences vs render_brick (all by design):
  * no pairs budget, no packing, no drops — every (tile, brick) pair the
    cull keeps is rendered (the budget starvation class of BENCH_r01
    cannot occur); capacity is the per-tile list length L instead;
  * compositing order is the tile list's front-to-back order (center
    depth along the tile cone axis), not each ray's exact entry order;
    near-equal-depth brick ties can swap — agreement with render_brick
    is to rendering tolerance (tests/test_render_brick_mxu.py);
  * requires the fixed serving geometry: tile=8, block=8, feat_dim=16
    (the kernel's (64, 512)x(512, 128) matmul shape).

Reference serving analog: `ngp_pl/test.py:30-45` (FPS protocol),
`ngp_pl/models/rendering.py:43-114` (lattice + T_threshold semantics).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.models.baked import BakedConfig, baked_extent
from google_nerf_tpu.models.encoders import sh_encode_deg4
from google_nerf_tpu.models.ngp import NGPConfig
from google_nerf_tpu.models.render_brick import (_refine_lists, _tile_cones,
                                                 _tile_lists,
                                                 brick_geometry, tile_order)
from google_nerf_tpu.ops.pallas.brick_field import (
    brick_field_tiles, brick_field_tiles_rgba,
    brick_field_tiles_t, brick_field_tiles_tp, brick_field_tiles_wl,
    window_span)
from google_nerf_tpu.ops.ray_aabb import clamp_near, ray_aabb_intersect

SQRT3 = 3.0 ** 0.5
NEAR_DISTANCE = 0.05


def _exact_hit_filter(bidx, brick_lo, brick_hi, o3, du3, t1r, t2r, dt,
                      Le: int):
    """Exact per-(candidate, ray) slab/window test + stable compaction.

    bidx: (Tb, Lc) depth-sorted candidate lists (-1 pads); o3/du3:
    (Tb, 64, 3) per-tile rays; t1r/t2r: (Tb, 64).  Returns (bidx2
    (Tb, Le) lists of TRUE-hit bricks in depth order, nhits (Tb,) true
    hit counts).  A dropped slot has NO (ray, window-sample) hit, so
    dropping it is eps-free — the kernel would contribute exactly zero.
    """
    Tb, Lc = bidx.shape
    safe_d = jnp.maximum(bidx, 0)
    lo_s = brick_lo[safe_d]                                 # (Tb, Lc, 3)
    hi_s = brick_hi[safe_d]
    inv3 = 1.0 / jnp.where(jnp.abs(du3) > 1e-10, du3,
                           jnp.where(du3 >= 0, 1e-10, -1e-10))
    t1b = t1r[:, None, :]                                   # (Tb, 1, 64)
    t2b = t2r[:, None, :]
    ta_p = jnp.broadcast_to(t1b, (Tb, Lc, 64))
    tb_p = jnp.broadcast_to(t2b, (Tb, Lc, 64))
    for k in range(3):
        a = (lo_s[:, :, None, k] - o3[:, None, :, k]) * inv3[:, None, :, k]
        b = (hi_s[:, :, None, k] - o3[:, None, :, k]) * inv3[:, None, :, k]
        ta_p = jnp.maximum(ta_p, jnp.minimum(a, b))
        tb_p = jnp.minimum(tb_p, jnp.maximum(a, b))
    n0e = jnp.maximum(jnp.ceil((ta_p - t1b) / dt - 0.5), 0.0)
    n1e = jnp.floor((tb_p - t1b) / dt - 0.5)
    hit_e = ((tb_p > ta_p) & (n1e >= n0e) & (t2b > 0)
             & (bidx >= 0)[:, :, None])                     # (Tb, Lc, 64)
    hit_any = jnp.any(hit_e, axis=2)                        # (Tb, Lc)
    nhits = jnp.sum(hit_any, axis=1).astype(jnp.int32)
    pose = jnp.where(hit_any, jnp.arange(Lc, dtype=jnp.int32)[None], Lc)
    pose = jax.lax.sort(pose, dimension=1)[:, :Le]
    bidx2 = jnp.where(pose < Lc,
                      jnp.take_along_axis(
                          bidx, jnp.minimum(pose, Lc - 1), axis=1), -1)
    return bidx2, nhits


def _pack_lists(bx, brick_lo, brick_hi):
    """Depth-sorted (Tb, Lx) lists -> (pool_blk, meta, nvalid).
    Pad slots are a suffix after the depth re-key: fill them with the
    tile's LAST valid block id so the Mosaic pipeline sees an unchanged
    block index and SKIPS the slab DMA — measured tile lists are ~5%
    occupied at 800^2, so pad-slot DMAs dominate traffic if they
    alternate with real blocks."""
    sf = jnp.maximum(bx, 0)
    nv = jnp.sum(bx >= 0, axis=1).astype(jnp.int32)
    lastv = sf[jnp.arange(sf.shape[0]), jnp.maximum(nv - 1, 0)]
    pb = jnp.where(bx >= 0, sf,
                   lastv[:, None]).reshape(-1).astype(jnp.int32)
    mt_ = jnp.concatenate(
        [brick_lo[sf], brick_hi[sf],
         jnp.zeros(sf.shape + (2,), jnp.float32)],
        axis=-1).reshape(-1, 8)
    return pb, mt_, nv


def _chunk_frontend(brick_lo, brick_hi, rays_o, rays_du, *, cfg, bcfg,
                    L, max_samples, macro_tiles, macro_L, exact_cull,
                    kernel, pbatch):
    """Cull + exact filter + list build for one tile-contiguous ray
    chunk — everything before any kernel runs.  Returns a dict of
    per-chunk arrays (shared by the per-chunk renderer `_mxu_tiles` and
    the global worklist frame `_wl_frame`)."""
    R = rays_o.shape[0]
    T = R // 64
    dt = SQRT3 / max_samples

    hits = ray_aabb_intersect(rays_o, rays_du, jnp.zeros(3),
                              jnp.full((3,), cfg.scale))
    hits = clamp_near(hits, NEAR_DISTANCE)
    t2 = jnp.where(hits[:, 1] > 0, hits[:, 1], 0.0)
    t1 = jnp.where(hits[:, 0] >= 0, jnp.maximum(hits[:, 0], 0.0), 0.0)

    # cone cull -> per-tile brick lists (reused raster front-end)
    o_t, axis_t, tan_t = _tile_cones(rays_o, rays_du, T, 64)
    t_far = t2.reshape(T, 64).max(-1)
    if macro_tiles > 1 and macro_L > 0:
        Tm = T // macro_tiles
        o_m, axis_m, tan_m = _tile_cones(rays_o, rays_du, Tm,
                                         64 * macro_tiles)
        t_far_m = t_far.reshape(Tm, macro_tiles).max(-1)
        midx, m_rel = _tile_lists(brick_lo, brick_hi, o_m, axis_m, tan_m,
                                  t_far_m, L=macro_L)
        bidx, t_rel = _refine_lists(brick_lo, brick_hi, midx, o_t, axis_t,
                                    tan_t, t_far, mt=macro_tiles,
                                    L=min(L, macro_L))
        macro_over = jnp.repeat(m_rel > midx.shape[1], macro_tiles)
    else:
        bidx, t_rel = _tile_lists(brick_lo, brick_hi, o_t, axis_t,
                                  tan_t, t_far, L=L)
        macro_over = jnp.zeros((T,), bool)
    Lp = bidx.shape[1]

    # re-key the selected lists to PLAIN front-to-back center depth: the
    # selection key's relevance tiers would misorder the in-kernel
    # composite (tier-1 bricks sort behind farther tier-0 bricks)
    safe = jnp.maximum(bidx, 0)
    c = 0.5 * (brick_lo + brick_hi)[safe]                   # (T, Lp, 3)
    t_c = jnp.sum((c - o_t[:, None, :]) * axis_t[:, None, :], -1)
    key = jnp.where(bidx >= 0, t_c, jnp.inf)
    _, bidx = jax.lax.sort((key, bidx), dimension=1, num_keys=1)

    nhits = jnp.zeros((T,), jnp.int32)
    if exact_cull > 0:
        # ---- EXACT per-ray hit filter (round 4): the cone cull's
        # conservative margin keeps bricks NO ray actually hits — they
        # inflate the lists (phantom slab DMAs) and the apparent
        # overflow population the drain must serve.  Filter the WIDE
        # candidate list to TRUE-hit slots (eps-free); any bands then
        # schedule by TRUE occupancy, and the drain serves only tiles
        # with more true hits than their rendered capacity. ----
        Le = min(exact_cull, Lp)
        if kernel in ("tp", "wl"):
            Le = max(pbatch, (Le // pbatch) * pbatch)
        bidx, nhits = _exact_hit_filter(
            bidx, brick_lo, brick_hi, rays_o.reshape(T, 64, 3),
            rays_du.reshape(T, 64, 3), t1.reshape(T, 64),
            t2.reshape(T, 64), dt, Le)

    pool_blk, meta, nvalid = _pack_lists(bidx, brick_lo, brick_hi)
    rays8 = jnp.concatenate(
        [rays_o, rays_du, t1[:, None], t2[:, None]], axis=1)
    sh = sh_encode_deg4(rays_du)
    return dict(pool_blk=pool_blk, meta=meta, nvalid=nvalid,
                nhits=nhits, t_rel=t_rel, macro_over=macro_over,
                rays8=rays8, sh=sh, o_t=o_t, axis_t=axis_t, tan_t=tan_t,
                t_far=t_far, t1=t1, t2=t2)


def frontend_caps(L, macro_tiles, macro_L, exact_cull, kernel, pbatch,
                  n_bricks):
    """Static (Lp, L_orig) the frontend's lists will have."""
    L = min(L, n_bricks)
    Lp = min(L, macro_L) if (macro_tiles > 1 and macro_L > 0) else L
    L_orig = Lp
    if exact_cull > 0:
        Le = min(exact_cull, Lp)
        if kernel in ("tp", "wl"):
            Le = max(pbatch, (Le // pbatch) * pbatch)
        Lp = Le
    return Lp, L_orig


def _drain_pass(out, fe, need, miss_sz, field, fargs, fkw, brick_lo,
                brick_hi, *, D, drain_L, drain_xc, exact_cull, kernel,
                pbatch, dt):
    """Exact overflow drain: re-render up to D needy tiles from scratch
    through compact drain_L-slot extended lists (VERDICT r3: no silent
    content drops).  Shared by the per-chunk and global-worklist paths;
    all tile-indexed arrays come from the frontend dict `fe`."""
    T = fe["nvalid"].shape[0]
    o_t, axis_t, tan_t, t_far = (fe["o_t"], fe["axis_t"], fe["tan_t"],
                                 fe["t_far"])
    t_rel = fe["t_rel"]

    def run_drain(out):
        score = jnp.where(need, jnp.maximum(t_rel, 1), 0)
        sc, dtid = jax.lax.top_k(score, D)
        dmask = sc > 0                                      # (D,)
        bidx_e, rel_e = _tile_lists(
            brick_lo, brick_hi, o_t[dtid], axis_t[dtid], tan_t[dtid],
            t_far[dtid], L=drain_L)
        # same depth re-key as the main lists
        safe_e = jnp.maximum(bidx_e, 0)
        c_e = 0.5 * (brick_lo + brick_hi)[safe_e]
        t_ce = jnp.sum((c_e - o_t[dtid][:, None, :])
                       * axis_t[dtid][:, None, :], -1)
        key_e = jnp.where(bidx_e >= 0, t_ce, jnp.inf)
        _, bidx_e = jax.lax.sort((key_e, bidx_e), dimension=1,
                                 num_keys=1)
        Lcd = drain_L
        over_d = jnp.zeros((D,), jnp.int32)
        if exact_cull > 0 and drain_xc > 0:
            # exact-filter the drain lists too: the drain's wide rebuild
            # is phantom-inflated like the main cull, and a 256-slot
            # static drain grid was measured at up to 6x the main
            # pass's steps (DESIGN_NOTES R4.2)
            Lcd = min(drain_xc, drain_L)
            if kernel in ("tp", "wl"):
                Lcd = max(pbatch, (Lcd // pbatch) * pbatch)
            o3a = fe["rays8"][:, 0:3].reshape(T, 64, 3)
            du3a = fe["rays8"][:, 3:6].reshape(T, 64, 3)
            bidx_e, nh_e = _exact_hit_filter(
                bidx_e, brick_lo, brick_hi, o3a[dtid], du3a[dtid],
                fe["t1"].reshape(T, 64)[dtid],
                fe["t2"].reshape(T, 64)[dtid], dt, Lcd)
            over_d = jnp.maximum(nh_e - Lcd, 0)
        pb_e, meta_e, nv_e = _pack_lists(bidx_e, brick_lo, brick_hi)
        out_d = field(pb_e, meta_e, *fargs, tid=dtid,
                      lbase=jnp.arange(D, dtype=jnp.int32) * Lcd,
                      nslots=jnp.where(dmask, nv_e, 0), Lcall=Lcd,
                      **fkw)
        dm_t = jnp.zeros((T,), bool).at[dtid].set(dmask)    # (T,)
        out = jnp.where(jnp.repeat(dm_t, 64)[:, None], out_d, out)
        # exactness accounting: tiles needing drain beyond D, and
        # drained tiles whose true list exceeded the drain capacity
        missed = need & ~dm_t
        dmiss = jnp.maximum(rel_e - drain_L, 0) + over_d
        und = (jnp.sum(jnp.where(missed, miss_sz, 0))
               + jnp.sum(jnp.where(dmask, dmiss, 0))).astype(jnp.int32)
        tr = (missed.sum()
              + jnp.sum(dmask & (dmiss > 0))).astype(jnp.int32)
        dsl = jnp.sum(jnp.where(dmask, nv_e, 0)).astype(jnp.int32)
        return out, und, tr, dsl

    # frames whose lists all fit their capacity skip the drain's
    # selection AND kernel call at runtime (lax.cond)
    return jax.lax.cond(
        jnp.any(need), run_drain,
        lambda o: (o, jnp.int32(0), jnp.int32(0), jnp.int32(0)), out)


@partial(jax.jit, static_argnames=("cfg", "bcfg", "L", "max_samples",
                                   "T_threshold", "macro_tiles", "macro_L",
                                   "kernel", "bands", "drain_tiles",
                                   "drain_L", "pbatch",
                                   "segment_slots", "exact_cull",
                                   "drain_xc", "wl_cap", "interpret"))
# bcfg is static: bcfg.block selects the kernels' slab geometry (Bk)
def _mxu_tiles(pool3, rgb_mlp, brick_lo, brick_hi, rays_o, rays_du, *,
               cfg: NGPConfig, bcfg: BakedConfig, L: int, max_samples: int,
               T_threshold: float, macro_tiles: int = 0, macro_L: int = 0,
               kernel: str = "n", bands: tuple = (),
               drain_tiles: int = 0, drain_L: int = 256, pbatch: int = 4,
               segment_slots: int = 0,
               exact_cull: int = 0, drain_xc: int = 0, wl_cap: int = 0,
               interpret: bool = False):
    """Render one tile-contiguous chunk of rays via the MXU kernel."""
    T = rays_o.shape[0] // 64
    s = baked_extent(cfg)
    dt = SQRT3 / max_samples
    fe = _chunk_frontend(brick_lo, brick_hi, rays_o, rays_du, cfg=cfg,
                         bcfg=bcfg, L=L, max_samples=max_samples,
                         macro_tiles=macro_tiles, macro_L=macro_L,
                         exact_cull=exact_cull, kernel=kernel,
                         pbatch=pbatch)
    pool_blk, meta, nvalid = fe["pool_blk"], fe["meta"], fe["nvalid"]
    nhits, t_rel, macro_over = fe["nhits"], fe["t_rel"], fe["macro_over"]
    rays8, sh = fe["rays8"], fe["sh"]
    Lp, L_orig = frontend_caps(L, macro_tiles, macro_L, exact_cull,
                               kernel, pbatch, int(brick_lo.shape[0]))

    if kernel in ("tp", "wl"):
        # "wl" uses the worklist kernel for the main pass (below) and
        # the tp kernel for the compact drain lists
        field = partial(brick_field_tiles_tp, P=pbatch, Bk=bcfg.block)
    elif kernel == "t":
        field = partial(brick_field_tiles_t, Bk=bcfg.block)
    elif kernel == "rgba":
        # pre-shaded slabs (models/baked_rgba.py): pool3 here is the
        # per-frame (nb, 32, vox) rgba pool; sh/mlp args are unused
        def field(pb, mt, r8, _sh, p3, _w1, _w2, _w3, **fk):
            return brick_field_tiles_rgba(pb, mt, r8, p3,
                                          Bk=bcfg.block, **fk)
    else:
        field = partial(brick_field_tiles, Bk=bcfg.block)
    fkw = dict(
        S=window_span(max_samples, bcfg.block, bcfg.voxel_res, cfg.scale),
        dt=dt, inv2s=0.5 / s, V=bcfg.voxel_res,
        tau_max=float(-np.log(T_threshold)), interpret=interpret)
    fargs = (rays8, sh, pool3, rgb_mlp[0], rgb_mlp[1], rgb_mlp[2])
    dma_slots = jnp.sum(nvalid)          # default: every real slot DMAs
    if segment_slots > 0 and kernel in ("tp", "rgba") and not bands:
        # ---- segmented-l rendering with DEAD-TILE DMA elision ----
        # The kernel-cost probe (R4) measured the frame wall as slab-DMA
        # issue cost (~2.4 us/slot fp8-64KB) with the compute body fully
        # hidden — so the win is not evaluating fewer pairs, it is
        # ISSUING fewer DMAs.  Render the list in segments of segment_
        # slots; between segments, tiles whose rays have ALL terminated
        # (or whose list is exhausted) have their remaining slots'
        # pool-block ids rewritten to a constant — consecutive equal
        # block indices make the Mosaic pipeline skip the slab fetch —
        # and nslots=0 skips the body.  Exactness is unchanged: a tile
        # is only skipped when the kernel's own per-ray live gate would
        # contribute nothing.  The composite resumes across calls via
        # the kernel's init carry.
        # segment length must divide Lp; only the tp kernel additionally
        # needs pbatch alignment (rgba steps one slot per grid step —
        # advisor r4: the old pbatch-stride search could hit segL=0 and
        # ZeroDivisionError at trace time for rgba / clamped-L lists)
        align = pbatch if kernel == "tp" else 1
        segL = max(align, (segment_slots // align) * align)
        while Lp % segL and segL > align:
            segL -= align
        assert Lp % segL == 0, (
            f"list capacity Lp={Lp} has no {align}-aligned divisor >= "
            f"{align}; align exact_cull / L to pbatch for kernel='tp'")
        tau_max_v = float(-np.log(T_threshold))
        pbT = pool_blk.reshape(T, Lp)
        mtT = meta.reshape(T, Lp, 8)
        tid_all = jnp.arange(T, dtype=jnp.int32)
        lb_seg = tid_all * segL
        out = jnp.zeros((T * 64, 8), jnp.float32)
        dma_slots = jnp.int32(0)
        for si in range(Lp // segL):
            s0 = si * segL
            ns_rem = jnp.clip(nvalid - s0, 0, segL)
            if si == 0:
                live_t = ns_rem > 0
            else:
                tau_t = out[:, 0].reshape(T, 64)
                live_t = jnp.any(tau_t < tau_max_v, axis=1) & (ns_rem > 0)
            pb_seg = jnp.where(live_t[:, None], pbT[:, s0:s0 + segL],
                               0).reshape(-1)
            mt_seg = mtT[:, s0:s0 + segL].reshape(-1, 8)
            out = field(pb_seg, mt_seg, *fargs, tid=tid_all, lbase=lb_seg,
                        nslots=jnp.where(live_t, ns_rem, 0), Lcall=segL,
                        init=out, **fkw)
            dma_slots += jnp.sum(jnp.where(live_t, ns_rem, 0))
        cap = jnp.full((T,), Lp, jnp.int32)
    elif not bands:
        out = field(pool_blk, meta, *fargs, nslots=nvalid, **fkw)
        cap = jnp.full((T,), Lp, jnp.int32)
    else:
        # band scheduling: tiles argsorted by brick-list occupancy, each
        # band rendered at its own (static) slot capacity — empty list
        # slots stop costing grid steps.  Lists are depth-sorted with
        # pads last, so a capacity cut keeps the NEAREST bricks;
        # over-capacity tiles are re-rendered exactly by the drain pass.
        assert sum(n for n, _ in bands) == T, (bands, T)
        order = jnp.argsort(-nvalid).astype(jnp.int32)
        band_of = jnp.zeros((T,), jnp.int32)
        cap = jnp.zeros((T,), jnp.int32)
        outs = []
        pos = 0
        for b, (nb, lpb) in enumerate(bands):
            tid_b = jax.lax.slice_in_dim(order, pos, pos + nb)
            pos += nb
            band_of = band_of.at[tid_b].set(b)
            lcb = min(lpb, Lp)
            if kernel == "tp":  # P consecutive list rows per grid step
                lcb = min(-(-lcb // pbatch) * pbatch, Lp)
            cap = cap.at[tid_b].set(lcb)
            outs.append(field(pool_blk, meta, *fargs, tid=tid_b,
                              nslots=jnp.minimum(nvalid[tid_b], lcb),
                              Lcall=lcb, **fkw))
        sel = jnp.repeat(band_of, 64)[:, None]                  # (T*64, 1)
        out = outs[0]
        for b in range(1, len(bands)):
            out = jnp.where(sel == b, outs[b], out)
        dma_slots = jnp.sum(jnp.minimum(nvalid, cap))

    # ---- exact overflow drain (VERDICT r3: no silent content drops) ----
    # Tiles whose TRUE relevant count exceeds their rendered capacity (or
    # whose macro candidate list overflowed) are re-rendered from scratch
    # through a COMPACT extended table: a direct full-brick-set selection
    # at drain_L slots for up to drain_tiles cones.  The kernel's l-grid
    # is the cursor, so one extra call drains everything; only content
    # beyond drain_L or beyond drain_tiles remains culled — counted.
    if exact_cull > 0:
        # exact-filtered lists: capacity cuts of NO-HIT slots are exact
        # (zero contribution); draining is needed only for tiles whose
        # TRUE-hit count exceeds their rendered capacity (band cap or
        # Lp), or whose wide candidate list truncated at the cull
        # (conservative: t_rel counts margin bricks too)
        need = (nhits > cap) | macro_over | (t_rel > L_orig)
        miss_sz = (jnp.maximum(nhits - cap, 0)
                   + jnp.maximum(t_rel - L_orig, 0))
    else:
        need = (t_rel > cap) | macro_over
        miss_sz = jnp.maximum(t_rel - cap, 0)
    if drain_tiles > 0:
        out, undrained, trunc, drain_slots = _drain_pass(
            out, fe, need, miss_sz, field, fargs, fkw, brick_lo,
            brick_hi, D=min(drain_tiles, T), drain_L=drain_L,
            drain_xc=drain_xc, exact_cull=exact_cull, kernel=kernel,
            pbatch=pbatch, dt=dt)
        dma_slots = dma_slots + drain_slots
    else:
        undrained = jnp.sum(jnp.where(need, miss_sz, 0)) \
            .astype(jnp.int32)
        trunc = need.sum().astype(jnp.int32)

    tau = out[:, 0]
    return dict(rgb=out[:, 1:4], depth=out[:, 4],
                opacity=jnp.clip(1.0 - jnp.exp(-tau), 0.0, 1.0),
                pairs_rendered=out[:, 5].sum().astype(jnp.int32),
                pairs_undrained=undrained,
                dma_slots=dma_slots.astype(jnp.int32),
                trunc_tiles=trunc)


@partial(jax.jit, static_argnames=(
    "cfg", "bcfg", "L", "max_samples", "T_threshold", "macro_tiles",
    "macro_L", "bands", "drain_tiles", "drain_L", "pbatch",
    "segment_slots", "exact_cull", "drain_xc", "wl_cap", "interpret",
    "W", "H", "Wp", "Hp", "exp_step_factor", "kernel"))
def _wl_frame(pool3, rgb_mlp, lo, hi, ro_ch, rd_ch, inv, *, W, H, Wp,
              Hp, exp_step_factor, cfg, bcfg, L, max_samples,
              T_threshold, macro_tiles, macro_L, kernel, bands,
              drain_tiles, drain_L, pbatch, segment_slots, exact_cull,
              drain_xc, wl_cap, interpret):
    """GLOBAL worklist frame (round 5): the cull/filter front-end runs
    per chunk (memory-bounded), but the kernel grid is ONE tile-major
    worklist of real (tile, P-slot group) work items over the WHOLE
    frame.  A per-chunk worklist needs a static per-chunk group budget
    sized for the DENSEST chunk — measured 5-10x the mean load, and pad
    steps still sequence (DESIGN_NOTES R5.4); globally the load
    averages out, so the static budget tracks the frame's real group
    count.  Segments re-check per-tile liveness between kernel calls
    (same early-termination semantics as the segmented tp path); groups
    beyond the budget drain exactly."""
    n_chunks = ro_ch.shape[0]
    cpr = ro_ch.shape[1] // 64
    Tg = n_chunks * cpr
    dt = SQRT3 / max_samples
    Lp, L_orig = frontend_caps(L, macro_tiles, macro_L, exact_cull,
                               "wl", pbatch, int(lo.shape[0]))

    fe_kw = dict(cfg=cfg, bcfg=bcfg, L=L, max_samples=max_samples,
                 macro_tiles=macro_tiles, macro_L=macro_L,
                 exact_cull=exact_cull, kernel="wl", pbatch=pbatch)
    fe_st = jax.lax.map(
        lambda rc: _chunk_frontend(lo, hi, rc[0], rc[1], **fe_kw),
        (ro_ch, rd_ch))
    fe = {k: v.reshape((-1,) + v.shape[2:]) for k, v in fe_st.items()}
    pool_blk, meta, nvalid = fe["pool_blk"], fe["meta"], fe["nvalid"]
    rays8, sh = fe["rays8"], fe["sh"]

    # ---- global worklist loop over list segments ----
    Pw = pbatch
    segL = max(Pw, ((segment_slots or Lp) // Pw) * Pw)
    while Lp % segL and segL > Pw:
        segL -= Pw
    assert Lp % segL == 0, (Lp, segL, Pw)
    Gmax = segL // Pw
    cap_wl = min(wl_cap if wl_cap > 0 else max(Tg // 2, 1024),
                 Tg * Gmax)
    tau_max_v = float(-np.log(T_threshold))
    S = window_span(max_samples, bcfg.block, bcfg.voxel_res, cfg.scale)
    out = jnp.zeros((Tg * 64, 8), jnp.float32)
    dma_slots = jnp.int32(0)
    wl_dropped_t = jnp.zeros((Tg,), jnp.int32)
    gi = jax.lax.broadcasted_iota(jnp.int32, (Tg, Gmax), 1)
    stream = jnp.arange(Tg * Gmax, dtype=jnp.int32)
    for si in range(Lp // segL):
        s0 = si * segL
        ns_rem = jnp.clip(nvalid - s0, 0, segL)
        if si == 0:
            live_t = ns_rem > 0
        else:
            tau_t = out[:, 0].reshape(Tg, 64)
            live_t = jnp.any(tau_t < tau_max_v, axis=1) & (ns_rem > 0)
        ns_eff = jnp.where(live_t, ns_rem, 0)
        g_t = (ns_eff + Pw - 1) // Pw                       # (Tg,)
        validg = (gi < g_t[:, None]).reshape(-1)
        keyf = jnp.where(validg, stream, Tg * Gmax)
        sk, src = jax.lax.sort((keyf, stream), num_keys=1)
        src = jax.lax.slice_in_dim(src, 0, cap_wl)
        slotv = jax.lax.slice_in_dim(sk, 0, cap_wl) < Tg * Gmax
        wt = src // Gmax
        wg = src - wt * Gmax
        nreal = jnp.sum(slotv)
        last_wt = jnp.take(wt, jnp.clip(nreal - 1, 0, cap_wl - 1))
        wt = jnp.where(slotv, wt, last_wt)
        wg = jnp.where(slotv, wg, 0)
        wlr = wt * Lp + s0 + wg * Pw
        wn = jnp.where(slotv,
                       jnp.clip(jnp.take(ns_eff, wt) - wg * Pw, 0, Pw),
                       0)
        wfl = (slotv & (wg == 0)).astype(jnp.int32)
        out_k = brick_field_tiles_wl(
            pool_blk, meta, rays8, sh, pool3,
            rgb_mlp[0], rgb_mlp[1], rgb_mlp[2],
            wt.astype(jnp.int32), wlr.astype(jnp.int32), wn, wfl,
            S=S, dt=dt, tau_max=tau_max_v, P=Pw, Bk=bcfg.block,
            init=out, interpret=interpret)
        served_g = jnp.clip(cap_wl - (jnp.cumsum(g_t) - g_t), 0, g_t)
        visited = served_g > 0
        out = jnp.where(jnp.repeat(visited, 64)[:, None], out_k, out)
        served = jnp.minimum(ns_eff, served_g * Pw)
        dma_slots += jnp.sum(served)
        wl_dropped_t = wl_dropped_t + (ns_eff - served)

    # ---- global exactness accounting + drain ----
    cap_t = jnp.full((Tg,), Lp, jnp.int32)
    if exact_cull > 0:
        need = ((fe["nhits"] > cap_t) | fe["macro_over"]
                | (fe["t_rel"] > L_orig))
        miss_sz = (jnp.maximum(fe["nhits"] - cap_t, 0)
                   + jnp.maximum(fe["t_rel"] - L_orig, 0))
    else:
        need = (fe["t_rel"] > cap_t) | fe["macro_over"]
        miss_sz = jnp.maximum(fe["t_rel"] - cap_t, 0)
    need = need | (wl_dropped_t > 0)
    miss_sz = miss_sz + wl_dropped_t
    field = partial(brick_field_tiles_tp, P=pbatch, Bk=bcfg.block)
    fkw = dict(S=S, dt=dt, inv2s=0.5 / baked_extent(cfg),
               V=bcfg.voxel_res, tau_max=tau_max_v, interpret=interpret)
    fargs = (rays8, sh, pool3, rgb_mlp[0], rgb_mlp[1], rgb_mlp[2])
    if drain_tiles > 0:
        out, undrained, trunc, drain_slots = _drain_pass(
            out, fe, need, miss_sz, field, fargs, fkw, lo, hi,
            D=min(drain_tiles, Tg), drain_L=drain_L, drain_xc=drain_xc,
            exact_cull=exact_cull, kernel="wl", pbatch=pbatch, dt=dt)
        dma_slots = dma_slots + drain_slots
    else:
        undrained = jnp.sum(jnp.where(need, miss_sz, 0)).astype(jnp.int32)
        trunc = need.sum().astype(jnp.int32)

    tau = out[:, 0]
    cat = dict(rgb=out[:, 1:4], depth=out[:, 4],
               opacity=jnp.clip(1.0 - jnp.exp(-tau), 0.0, 1.0),
               pairs_rendered=out[:, 5].sum().astype(jnp.int32),
               pairs_undrained=undrained,
               dma_slots=dma_slots.astype(jnp.int32),
               trunc_tiles=trunc)

    def unpermute(x):
        x = jnp.take(x[:Wp * Hp], inv, axis=0)
        if (Wp, Hp) != (W, H):
            x = x.reshape((Hp, Wp) + x.shape[1:])[:H, :W]
            x = x.reshape((H * W,) + x.shape[2:])
        return x

    rgb = unpermute(cat["rgb"])
    opacity = unpermute(cat["opacity"])
    depth = unpermute(cat["depth"])
    bg = 1.0 if exp_step_factor == 0.0 else 0.0
    rgb = rgb + bg * (1.0 - opacity[:, None])
    return dict(rgb=rgb, opacity=opacity, depth=depth,
                trunc_tiles=cat["trunc_tiles"],
                pairs_rendered=cat["pairs_rendered"],
                pairs_undrained=cat["pairs_undrained"],
                dma_slots=cat["dma_slots"])


def render_brick_mxu(baked, cfg: NGPConfig, rays_o, rays_d, W, H, *,
                     bcfg: BakedConfig = BakedConfig(), L: int = 48,
                     max_samples: int = 512, T_threshold: float = 1e-2,
                     chunk_tiles: int = 512, macro_tiles: int = 8,
                     macro_L: int = 1024, geometry=None, kernel: str = "n",
                     bands=(), drain_tiles: int = 256, drain_L: int = 256,
                     pbatch: int = 4,
                     segment_slots: int = 0, exact_cull: int = 0,
                     drain_xc: int = 0, wl_cap: int = 0,
                     exp_step_factor: float = 0.0, interpret=None):
    """Full-frame MXU brick renderer over (W*H) rays, image row-major.

    bands: () = every tile gets L list slots (one kernel call/chunk);
    "auto" = occupancy-banded scheduling (1/8 of tiles at L, 1/8 at L/2,
    1/4 at L/4, 1/2 at L/8 — tiles argsorted by true list occupancy);
    or an explicit tuple of (n_tiles, Lp) pairs summing to chunk_tiles.

    exact_cull (> 0): re-test every (candidate slot, ray) of the wide
    L-slot cull list with the kernel's own slab/window test in XLA and
    compact to `exact_cull` slots of TRUE-hit bricks before any kernel
    runs — eps-free (a no-hit slot contributes exactly zero), removes
    the cone-margin phantom DMAs, and shrinks the genuine drain
    population to tiles with more true hits than exact_cull.  Use a
    wide L (e.g. 192) with exact_cull ~48.  Forces bands off.

    segment_slots (kernel="tp", bands off): render each tile's list in
    segments of this many slots; between segments, tiles whose rays all
    terminated stop issuing slab DMAs (the measured per-slot wall,
    tools/kernel_cost_probe.py) — their remaining slots' block ids
    collapse to a constant the Mosaic pipeline elides.  Exact by the
    same live-gate semantics as in-kernel early termination; dma_slots
    telemetry reports the slots actually fetched.

    drain_tiles/drain_L: exact overflow drain — per chunk, up to
    drain_tiles tiles whose true brick count exceeds their band/list
    capacity are re-rendered from scratch through compact drain_L-slot
    extended lists (one extra kernel call; the kernel's l-grid is the
    cursor).  pairs_undrained == 0 in the output certifies the frame
    rendered every culled-in pair; drain_tiles=0 disables (the r2
    truncating behavior).
    """
    if interpret is None:  # Mosaic needs a TPU; elsewhere run interpreted
        interpret = jax.default_backend() != "tpu"
    tile = 8
    assert bcfg.feat_dim == 16, "kernel row layout is 8 corners x 16 feat"
    vox = bcfg.block ** 3
    if kernel in ("tp", "wl"):
        # list stride, band capacities, and the drain's per-tile list
        # length must all be pbatch-aligned (the P-batched and worklist
        # kernels read P consecutive list rows per grid step)
        assert pbatch in (1, 2, 4, 8, 16), pbatch
        L = max(pbatch, (L // pbatch) * pbatch)
        drain_L = max(pbatch, (drain_L // pbatch) * pbatch)
    lo, hi, pool_base = geometry if geometry is not None else \
        brick_geometry(baked["block_map"], bcfg, cfg)
    if kernel == "rgba":
        # per-frame pre-shaded slabs (models/baked_rgba.bake_rgba) —
        # the caller bakes them for this camera origin and the bake time
        # is part of the frame
        pool3 = baked["poolRGBA"]
        assert pool3.shape[1:] == (32, vox), pool3.shape
    elif kernel in ("t", "tp", "wl"):
        # the t-kernels want slabs pre-transposed to (128, 512); cache the
        # one-time device transpose on the baked dict
        if "poolT" not in baked:
            baked["poolT"] = jnp.swapaxes(
                baked["pool"].reshape(-1, vox, 128), 1, 2)
        pool3 = baked["poolT"]
    else:
        pool3 = baked["pool"].reshape(-1, vox, 128)
    Wp = ((W + tile - 1) // tile) * tile
    Hp = ((H + tile - 1) // tile) * tile
    if (Wp, Hp) != (W, H):
        col = np.minimum(np.arange(Wp), W - 1)
        row = np.minimum(np.arange(Hp), H - 1)
        sel = jnp.asarray((row[:, None] * W + col[None]).reshape(-1))
        rays_o = jnp.take(rays_o, sel, axis=0)
        rays_d = jnp.take(rays_d, sel, axis=0)
    perm, inv = tile_order(Wp, Hp, tile)
    norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rdu = rays_d / jnp.where(norm > 0, norm, 1.0)
    ro_t = jnp.take(rays_o, perm, axis=0)
    rd_t = jnp.take(rdu, perm, axis=0)

    n_tiles = (Wp * Hp) // 64
    L = min(L, int(lo.shape[0]))
    cpr = max(min(int(chunk_tiles), n_tiles), 1)
    if segment_slots > 0 or kernel == "wl":
        assert kernel in ("tp", "rgba", "wl"), \
            "segment_slots needs an init-carry kernel (tp/rgba/wl)"
        bands = ()      # segmentation subsumes band scheduling's savings
    if bands == "auto":
        # with exact_cull, bands schedule the FILTERED lists — derive
        # capacities from the compacted length, not the wide L
        eb = min(exact_cull, L) if exact_cull > 0 else L
        e, q = cpr // 8, cpr // 4
        bands = ((e, eb), (e, max(eb // 2, 8)), (q, max(eb // 4, 8)),
                 (cpr - e - e - q, max(eb // 8, 8)))
        bands = tuple((n, lp) for n, lp in bands if n > 0)
    bands = tuple(bands)
    mL = min(macro_L, int(lo.shape[0]))
    mt = macro_tiles if mL > 0 else 0
    while mt > 1 and cpr % mt:
        mt //= 2
    # ---- WHOLE-FRAME jit (round 4): the chunk loop runs as a lax.map
    # over stacked ray chunks inside ONE jit.  Measured NEUTRAL on frame
    # time (DESIGN_NOTES R4.4: the trace span that suggested ~200 ms of
    # host glue was the host BLOCKING on device compute; eager chunk
    # dispatch was already async-pipelined) — kept for the single-
    # dispatch serving API and the once-in-HLO kernel body. ----
    n_chunks = -(-n_tiles // cpr)
    pad_rays = n_chunks * cpr * 64 - Wp * Hp
    if pad_rays:
        ro_t = jnp.concatenate(
            [ro_t, jnp.full((pad_rays, 3), 100.0)])
        rd_t = jnp.concatenate(
            [rd_t, jnp.full((pad_rays, 3), 1.0 / SQRT3)])
    ro_ch = ro_t.reshape(n_chunks, cpr * 64, 3)
    rd_ch = rd_t.reshape(n_chunks, cpr * 64, 3)
    mxu_kw = dict(
        cfg=cfg, bcfg=bcfg, L=L, max_samples=max_samples,
        T_threshold=T_threshold, macro_tiles=mt if mt > 1 else 0,
        macro_L=mL, kernel=kernel, bands=bands,
        drain_tiles=min(drain_tiles, cpr),
        drain_L=(min(drain_L, int(lo.shape[0]))
                 if kernel not in ("tp", "wl")
                 else max(pbatch, (min(drain_L, int(lo.shape[0]))
                                   // pbatch) * pbatch)),
        pbatch=pbatch,
        segment_slots=segment_slots, exact_cull=exact_cull,
        drain_xc=drain_xc, wl_cap=wl_cap, interpret=interpret)
    frame_fn = _wl_frame if kernel == "wl" else _mxu_frame
    cat = frame_fn(pool3, baked["rgb_mlp"], lo, hi, ro_ch, rd_ch,
                   jnp.asarray(inv), W=W, H=H, Wp=Wp, Hp=Hp,
                   exp_step_factor=exp_step_factor, **mxu_kw)
    return cat


@partial(jax.jit, static_argnames=(
    "cfg", "bcfg", "L", "max_samples", "T_threshold", "macro_tiles",
    "macro_L", "kernel", "bands", "drain_tiles", "drain_L", "pbatch",
    "segment_slots", "exact_cull",
    "drain_xc", "wl_cap", "interpret", "W", "H", "Wp", "Hp",
    "exp_step_factor"))
def _mxu_frame(pool3, rgb_mlp, lo, hi, ro_ch, rd_ch, inv, *, W, H,
               Wp, Hp, exp_step_factor, **mxu_kw):
    def one_chunk(rc):
        return _mxu_tiles(pool3, rgb_mlp, lo, hi, rc[0], rc[1],
                          **mxu_kw)

    outs = jax.lax.map(one_chunk, (ro_ch, rd_ch))
    cat = {k: (v.reshape((-1,) + v.shape[2:]) if v.ndim > 1 else v.sum())
           for k, v in outs.items()}

    def unpermute(x):
        x = jnp.take(x[:Wp * Hp], inv, axis=0)
        if (Wp, Hp) != (W, H):
            x = x.reshape((Hp, Wp) + x.shape[1:])[:H, :W]
            x = x.reshape((H * W,) + x.shape[2:])
        return x

    rgb = unpermute(cat["rgb"])
    opacity = unpermute(cat["opacity"])
    depth = unpermute(cat["depth"])
    bg = 1.0 if exp_step_factor == 0.0 else 0.0
    rgb = rgb + bg * (1.0 - opacity[:, None])
    return dict(rgb=rgb, opacity=opacity, depth=depth,
                trunc_tiles=cat["trunc_tiles"],
                pairs_rendered=cat["pairs_rendered"],
                pairs_undrained=cat["pairs_undrained"],
                dma_slots=cat["dma_slots"])
