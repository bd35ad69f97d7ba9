"""Tile-rasterized baked-brick renderer — the serving path designed for
the v5e gather ceiling.

Every other test renderer here is a ray-MARCHER: each ray pays occupancy
gather rows to discover its content (~30-250 rows/ray at 800^2), which the
XLA gather ceiling (~40-160M rows/s, tools/microbench_gather.py) caps at
~1 FPS.  This renderer inverts the traversal: the baked field's occupied
BRICKS (8^3-voxel blocks of the sparse pool, models/baked.py) are
rasterized once per frame into per-tile front-to-back lists, so

  * a background ray touches NOTHING (zero gathers, zero field work);
  * a content sample costs exactly ONE fat pool-row gather (256 B holding
    all 8 trilinear corners) — the brick identity comes from the raster,
    not from a block_map lookup;
  * all remaining per-ray work (cone cull, slab tests, lattice windows,
    compositing) is dense VPU arithmetic at static shapes.

Pipeline (all jitted, no host sync):
  1. cone cull      every (tile, brick) pair: conservative sphere-vs-cone
                    test built from the tile's own rays (convention-free —
                    no intrinsics; works for any pinhole pose).
  2. tile lists     top_k nearest-L relevant bricks per tile, front-to-back.
  3. pair build     exact ray/brick-AABB slab tests against the tile list;
                    per-ray sort by entry lattice index; keep first Lk.
  4. pair packing   plan_packing over (rays, Lk) pairs (ray-major), so the
                    field runs on ~content pairs only.
  5. field          one pool gather per sample + trilerp + rgb MLP
                    (exact view-dependent shading, same math as
                    models/baked.baked_field).
  6. composite      two-level and exact: per-pair interior transmittance
                    reduction over the S-sample window, then an exclusive
                    cumprod over each ray's ordered pairs.

With `pass_fracs` set, steps 4-6 instead run as a short sequence of
statically-budgeted passes, one pair per live ray per pass: a ray whose
transmittance has fallen below T_threshold stops consuming field work, so
pairs behind opaque content are never evaluated — the brick-level analog
of the reference's early ray termination (`rendering.py:99,157`), still
with zero host syncs.

Semantics match the marching renderers' lattice (global dt = sqrt(3)/
max_samples anchored at the ray's scene-AABB entry, near clamp 0.05,
T_threshold early-stop, reference `ngp_pl/models/rendering.py:43-114`);
the sample SET is the baked-brick superset of the occupancy-march set, so
outputs agree to rendering tolerance (tests/test_render_brick.py) rather
than bit-exactly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.models.baked import (BakedConfig, baked_extent,
                                          trilerp_w8)
from google_nerf_tpu.models.mlp import mlp_apply
from google_nerf_tpu.models.ngp import NGPConfig
from google_nerf_tpu.models.encoders import sh_encode_deg4
from google_nerf_tpu.ops.compaction import pack, plan_packing, unpack
from google_nerf_tpu.ops.ray_aabb import clamp_near, ray_aabb_intersect
from google_nerf_tpu.ops.trunc_exp import trunc_exp

SQRT3 = 3.0 ** 0.5
NEAR_DISTANCE = 0.05
_TIER_OFFSET = 1.0e6     # > any in-scene ray t; separates selection tiers


def brick_geometry(block_map, bcfg: BakedConfig, cfg: NGPConfig):
    """Host-side: world AABBs of the occupied bricks, in pool order.

    Returns (lo, hi, pool_base): (Nb, 3) f32 world bounds and the (Nb,)
    int32 first-row index of each brick's voxels in the baked pool.
    """
    bm = np.asarray(block_map)
    Gb, Bk, V = bcfg.block_res, bcfg.block, bcfg.voxel_res
    s = baked_extent(cfg)
    blk_ids = np.flatnonzero(bm >= 0).astype(np.int32)
    order = np.argsort(bm[blk_ids])          # pool order
    blk_ids = blk_ids[order]
    bx = blk_ids // (Gb * Gb)
    by = (blk_ids // Gb) % Gb
    bz = blk_ids % Gb
    origin = np.stack([bx, by, bz], -1).astype(np.float32) * Bk
    lo = (origin / V * 2.0 - 1.0) * s
    hi = ((origin + Bk) / V * 2.0 - 1.0) * s
    pool_base = (bm[blk_ids] * (Bk ** 3)).astype(np.int32)
    return (jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(pool_base))


def tile_order(W: int, H: int, tile: int):
    """Host-side: permutation grouping pixel-rays tile-by-tile (row-major
    tiles, row-major within a tile) + its inverse.  W, H must be multiples
    of `tile` (callers pad the image if not)."""
    idx = np.arange(W * H, dtype=np.int32).reshape(H, W)
    Ty, Tx = H // tile, W // tile
    perm = (idx.reshape(Ty, tile, Tx, tile).transpose(0, 2, 1, 3)
            .reshape(-1))
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return perm, inv


def _tile_cones(rays_o, rays_du, n_tiles: int, tpx: int):
    """Per-tile bounding cone from the tile's own unit ray dirs:
    (apex o, axis c_hat, tan of half-angle).  Convention-free."""
    d = rays_du.reshape(n_tiles, tpx, 3)
    axis = d.mean(1)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    cos_min = jnp.min(jnp.sum(d * axis[:, None, :], -1), 1)
    cos_min = jnp.clip(cos_min, 1e-3, 1.0)
    tan_half = jnp.sqrt(1.0 - cos_min ** 2) / cos_min
    o = rays_o.reshape(n_tiles, tpx, 3)[:, 0]   # pinhole: shared origin
    return o, axis, tan_half


def _cone_keys(c, r_b, o, axis, tan_half, t_far):
    """Shared cone-cull math: selection keys of candidate bricks (centers
    `c`, bounding radii `r_b` — broadcastable to (T, N, ...)) against T
    cones.  Returns (key, relevant): key = entry-depth + tier offset
    (+inf = irrelevant).

    Selection under overflow is two-tier: bricks whose CENTER lies inside
    the exact cone (near-certain ray hits) outrank bricks that pass only
    via the conservative r_b margin (possible grazers), each tier
    front-to-back.  The margin zone is ~the whole cull slack — without the
    tiers, fat bricks radially offset from the axis flood the list and
    REAL content overflows (measured -4 dB at L=96 on the smoke scene;
    exact per-ray slab tests downstream make margin bricks harmless)."""
    v = c - o[:, None, :]                            # (T, N, 3)
    t_c = jnp.sum(v * axis[:, None, :], -1)
    # conservative: radial distance to cone axis vs cone radius + margin
    rad2 = jnp.sum(v * v, -1) - t_c ** 2
    lim = t_c * tan_half[:, None] + r_b * (1.0 + tan_half[:, None])
    relevant = (t_c > -r_b) & (t_c < t_far[:, None] + r_b) \
        & (rad2 <= lim * lim)
    lim0 = jnp.maximum(t_c, 0.0) * tan_half[:, None]
    tier = jnp.where(rad2 <= lim0 * lim0, 0.0, _TIER_OFFSET)
    key = jnp.where(relevant, t_c + tier, jnp.inf)
    return key, relevant


@partial(jax.jit, static_argnames=("L",))
def _tile_lists(brick_lo, brick_hi, o, axis, tan_half, t_far, *, L: int):
    """Cone-cull every brick against every cone; keep the L most relevant
    bricks per cone.  Returns (T, L) brick index (-1 pad), plus the
    per-cone TRUE relevant count (band scheduling and the overflow drain
    compare it against the rendered capacity)."""
    c = 0.5 * (brick_lo + brick_hi)[None]            # (1, Nb, 3)
    r_b = 0.5 * jnp.linalg.norm(brick_hi - brick_lo, axis=-1)[None]
    key, relevant = _cone_keys(c, r_b, o, axis, tan_half, t_far)
    n_rel = relevant.sum(-1).astype(jnp.int32)
    neg_t, bidx = jax.lax.top_k(-key, L)             # tier0 asc-t, tier1 asc-t
    bidx = jnp.where(jnp.isfinite(neg_t), bidx, -1)
    return bidx.astype(jnp.int32), n_rel


@partial(jax.jit, static_argnames=("mt", "L"))
def _refine_lists(brick_lo, brick_hi, midx, o, axis, tan_half, t_far, *,
                  mt: int, L: int):
    """Stage 2 of the hierarchical cull: narrow each macro group's
    candidate list (midx, (Tm, Lm) global brick ids, -1 pad) down to each
    of its `mt` member tiles' own nearest-L list.  Same key math as
    _tile_lists but over Lm gathered candidates instead of all Nb bricks.

    Dropping a brick at the macro stage is safe for any brick a ray
    actually hits: a hit brick lies within r_b of a ray line, every tile
    ray is inside the macro cone, and the macro relevance test accepts
    everything within r_b of the cone — so only never-hit margin bricks
    differ, and Lm overflow is flagged by the caller."""
    T = o.shape[0]
    safe = jnp.maximum(midx, 0)
    c_all = 0.5 * (brick_lo + brick_hi)
    r_all = 0.5 * jnp.linalg.norm(brick_hi - brick_lo, axis=-1)
    c = jnp.repeat(c_all[safe], mt, axis=0)          # (T, Lm, 3)
    r_b = jnp.repeat(r_all[safe], mt, axis=0)
    cand = jnp.repeat(safe, mt, axis=0)
    cand_valid = jnp.repeat(midx >= 0, mt, axis=0)
    key, relevant = _cone_keys(c, r_b, o, axis, tan_half, t_far)
    key = jnp.where(cand_valid, key, jnp.inf)
    relevant &= cand_valid
    n_rel = relevant.sum(-1).astype(jnp.int32)
    neg_t, sel = jax.lax.top_k(-key, L)
    bidx = jnp.take_along_axis(cand, sel, 1)
    bidx = jnp.where(jnp.isfinite(neg_t), bidx, -1)
    return bidx.astype(jnp.int32), n_rel


def _pair_windows(rays_o, rays_du, t1, t2, brick_lo, brick_hi, pool_base,
                  bidx_tile, tpx, dt):
    """Exact slab tests of each ray against its TILE's brick list.
    Brick bounds are gathered once per (tile, l) — 64x fewer gather rows
    than per-ray — and broadcast over the tile's rays.  Returns per-(ray,
    l): n0/n1 lattice window (n0 > n1 = miss) and per-ray pool base.
    Lattice: t = t1_ray + (n + 0.5) * dt (global per-ray anchor, matching
    the marching renderers)."""
    T, L = bidx_tile.shape
    safe = jnp.maximum(bidx_tile, 0)
    lo = brick_lo[safe][:, None]                     # (T, 1, L, 3)
    hi = brick_hi[safe][:, None]
    inv_d = 1.0 / jnp.where(jnp.abs(rays_du) > 1e-10, rays_du,
                            jnp.where(rays_du >= 0, 1e-10, -1e-10))
    o = rays_o.reshape(T, tpx, 1, 3)
    inv_d = inv_d.reshape(T, tpx, 1, 3)
    t_lo = (lo - o) * inv_d
    t_hi = (hi - o) * inv_d
    ta = jnp.max(jnp.minimum(t_lo, t_hi), -1).reshape(-1, L)   # (R, L)
    tb = jnp.min(jnp.maximum(t_lo, t_hi), -1).reshape(-1, L)
    ta = jnp.maximum(ta, t1[:, None])
    tb = jnp.minimum(tb, t2[:, None])
    n0 = jnp.ceil((ta - t1[:, None]) / dt - 0.5).astype(jnp.int32)
    n0 = jnp.maximum(n0, 0)
    n1 = jnp.floor((tb - t1[:, None]) / dt - 0.5).astype(jnp.int32)
    hit = jnp.repeat(bidx_tile >= 0, tpx, axis=0) & (tb > ta) & (n1 >= n0)
    pb = jnp.repeat(pool_base[safe], tpx, axis=0)    # (R, L)
    return jnp.where(hit, n0, jnp.iinfo(jnp.int32).max // 2), \
        jnp.where(hit, n1, -1), \
        jnp.where(hit, pb, 0)


def _pair_field(pool, rgb_mlp, rays_o, rays_du, t1, p_n0, p_n1, p_pb,
                p_ray, slot_valid, *, dt, S, V, Bk, s, F):
    """5+6a: evaluate the baked field on the packed (P, S) sample windows
    and composite each pair's interior -> (pair_tau, pair_rgb, pair_dep)."""
    P = p_n0.shape[0]
    n = p_n0[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
    p_t1 = jnp.take(t1, p_ray)
    ts = p_t1[:, None] + (n.astype(jnp.float32) + 0.5) * dt
    s_valid = (n <= p_n1[:, None]) & slot_valid[:, None]
    ro = jnp.take(rays_o, p_ray, axis=0)
    rd = jnp.take(rays_du, p_ray, axis=0)
    xyz = ro[:, None, :] + ts[..., None] * rd[:, None, :]
    pos = jnp.clip(xyz / s * 0.5 + 0.5, 0.0, 1.0 - 1e-6) * V
    v0 = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - v0).astype(jnp.bfloat16)
    local = jnp.clip(v0 - (v0 // Bk) * Bk, 0, Bk - 1)
    lid = (local[..., 0] * Bk + local[..., 1]) * Bk + local[..., 2]
    row_idx = jnp.where(s_valid, p_pb[:, None] + lid, 0)
    rows = jnp.take(pool, row_idx.reshape(-1), axis=0)      # THE gather
    rows = rows.astype(jnp.bfloat16).reshape(P * S, 8, F)
    w8 = trilerp_w8(frac.reshape(P * S, 3))
    h = jnp.einsum("nc,ncf->nf", w8, rows).astype(jnp.float32)
    sigma = jnp.where(s_valid.reshape(-1), trunc_exp(h[:, 0]), 0.0)
    sh = sh_encode_deg4(rd)                                  # per pair
    rgb_in = jnp.concatenate(
        [jnp.broadcast_to(sh[:, None, :], (P, S, sh.shape[-1]))
         .reshape(P * S, -1), h], axis=-1)
    rgb_s = jax.nn.sigmoid(
        mlp_apply(rgb_mlp, rgb_in, compute_dtype=jnp.bfloat16))

    sd = jnp.minimum(sigma.reshape(P, S) * dt, 80.0)
    tau_in = jnp.cumsum(sd, -1) - sd
    T_in = jnp.exp(-tau_in)
    alpha = 1.0 - jnp.exp(-sd)
    w = T_in * alpha
    pair_tau = sd.sum(-1)
    pair_rgb = (w[..., None] * rgb_s.reshape(P, S, 3)).sum(1)
    pair_dep = (w * ts).sum(-1)
    return pair_tau, pair_rgb, pair_dep


@partial(jax.jit, static_argnames=(
    "cfg", "bcfg", "tile", "L", "Lk", "S", "max_samples", "T_threshold",
    "pairs_budget", "pass_fracs", "drain_frac", "macro_tiles", "macro_L"))
def _render_tiles(pool, rgb_mlp, brick_lo, brick_hi, pool_base, rays_o,
                  rays_du, *, cfg: NGPConfig, bcfg: BakedConfig, tile: int,
                  L: int, Lk: int, S: int, max_samples: int,
                  T_threshold: float, pairs_budget: int,
                  pass_fracs: tuple = (), drain_frac: float = 0.25,
                  macro_tiles: int = 0, macro_L: int = 0):
    """Render one tile-contiguous chunk of rays.  Returns per-ray rgb/
    opacity/depth plus truncation telemetry."""
    R = rays_o.shape[0]
    tpx = tile * tile
    T = R // tpx
    V, Bk = bcfg.voxel_res, bcfg.block
    s = baked_extent(cfg)
    F = bcfg.feat_dim
    dt = SQRT3 / max_samples

    hits = ray_aabb_intersect(rays_o, rays_du, jnp.zeros(3),
                              jnp.full((3,), cfg.scale))
    hits = clamp_near(hits, NEAR_DISTANCE)
    t2 = jnp.where(hits[:, 1] > 0, hits[:, 1], 0.0)
    t1 = jnp.where(hits[:, 0] >= 0, jnp.maximum(hits[:, 0], 0.0), 0.0)

    # 1-2: cone cull -> per-tile nearest-L brick lists.  With macro_tiles
    # set, the cull is hierarchical: groups of `macro_tiles` consecutive
    # tiles share one coarse cull against ALL bricks (keeping macro_L
    # candidates), and each tile only refines its group's candidates —
    # O(T/mt * Nb + T * Lm) selection keys instead of O(T * Nb), the
    # dominant pair-building cost at serving resolutions (800^2 at
    # Nb~20k bricks sorts ~190M keys/frame single-level).
    o_t, axis_t, tan_t = _tile_cones(rays_o, rays_du, T, tpx)
    t_far = t2.reshape(T, tpx).max(-1)
    if macro_tiles > 1 and macro_L > 0:
        Tm = T // macro_tiles
        o_m, axis_m, tan_m = _tile_cones(rays_o, rays_du, Tm,
                                         tpx * macro_tiles)
        t_far_m = t_far.reshape(Tm, macro_tiles).max(-1)
        midx, m_rel = _tile_lists(brick_lo, brick_hi, o_m, axis_m, tan_m,
                                   t_far_m, L=macro_L)
        # a tile can hold at most its macro group's macro_L candidates
        bidx, t_rel = _refine_lists(brick_lo, brick_hi, midx, o_t, axis_t,
                                     tan_t, t_far, mt=macro_tiles,
                                     L=min(L, macro_L))
        tile_over = ((t_rel > bidx.shape[1])
                     | jnp.repeat(m_rel > midx.shape[1], macro_tiles))
    else:
        bidx, t_rel = _tile_lists(brick_lo, brick_hi, o_t, axis_t,
                                  tan_t, t_far, L=L)
        tile_over = t_rel > bidx.shape[1]

    # 3: exact per-ray windows against the tile list
    n0, n1, pb = _pair_windows(rays_o, rays_du, t1, t2, brick_lo, brick_hi,
                               pool_base, bidx, tpx, dt)
    # per-ray front-to-back pair order (tile lists are only approximately
    # per-ray sorted): nearest-Lk selection by entry index via top_k
    # (misses carry n0 = +BIG and select last) — measured much cheaper
    # than a 3-array lax.sort over (R, L)
    Lk = min(Lk, bidx.shape[1])   # hierarchical cull may narrow the lists
    if Lk < bidx.shape[1]:
        ray_over = (n1 >= n0).sum(-1) > Lk
        neg_n0, sel = jax.lax.top_k(-n0, Lk)
        n0 = -neg_n0                                  # ascending n0
        n1 = jnp.take_along_axis(n1, sel, 1)
        pb = jnp.take_along_axis(pb, sel, 1)
    else:
        ray_over = jnp.zeros(R, bool)
        n0, n1, pb = jax.lax.sort((n0, n1, pb), num_keys=1)
    pair_valid = n1 >= n0
    pairs_total = pair_valid.sum().astype(jnp.int32)

    field = partial(_pair_field, pool, rgb_mlp, rays_o, rays_du, t1,
                    dt=dt, S=S, V=V, Bk=Bk, s=s, F=F)

    if not pass_fracs:
        # 4: pack ALL content pairs at once, field, then 6b combine.
        # sample-major: under budget pressure every ray keeps its NEAR
        # (front-to-back rank) windows and only far tails drop — mostly
        # occluded content.  Ray-major packing silently starved whole
        # trailing TILES of the stream instead (the object vanished from
        # the image center at -8.5 dB while the telemetry flag read "1").
        pairs_budget = min(pairs_budget, R * Lk)
        plan = plan_packing(pair_valid, pairs_budget, sample_major=True)
        ray_of_pair = jnp.broadcast_to(
            jnp.arange(R, dtype=jnp.int32)[:, None], (R, Lk))
        p_ray = pack(ray_of_pair.reshape(-1), plan)
        pair_tau, pair_rgb, pair_dep = field(
            pack(n0.reshape(-1), plan), pack(n1.reshape(-1), plan),
            pack(pb.reshape(-1), plan), p_ray, plan.slot_valid)
        dropped = jnp.maximum(plan.n_valid - pairs_budget, 0) \
            .astype(jnp.int32)

        # 6b: per-ray combine over ordered pairs (exclusive transmittance)
        tau_g = unpack(pair_tau, plan).reshape(R, Lk)
        rgb_g = unpack(pair_rgb, plan).reshape(R, Lk, 3)
        dep_g = unpack(pair_dep, plan).reshape(R, Lk)
        T_bef = jnp.exp(-(jnp.cumsum(tau_g, -1) - tau_g))
        live = T_bef > T_threshold
        Tl = jnp.where(live, T_bef, 0.0)
        rgb = (Tl[..., None] * rgb_g).sum(1)
        depth = (Tl * dep_g).sum(1)
        tau_tot = jnp.where(live, tau_g, 0.0).sum(-1)
    else:
        # 4': sequential passes, one pair per live ray per pass — pairs
        # behind opaque content are never field-evaluated (the analog of
        # the reference's per-sample early ray termination,
        # `rendering.py:99,157`, at brick-pair granularity).  Each ray
        # advances its own CURSOR through its (front-to-back, prefix-
        # valid) pair list; a ray that misses a pass's packing budget
        # simply retries next pass instead of losing its remaining
        # content, and whatever is left after the pass list goes to the
        # exact packed drain below.
        tau_max = -float(np.log(T_threshold))
        ridx = jnp.arange(R, dtype=jnp.int32)
        n_valid_r = pair_valid.sum(-1)
        cur = jnp.zeros(R, jnp.int32)
        tau_tot = jnp.zeros(R)
        rgb = jnp.zeros((R, 3))
        depth = jnp.zeros(R)
        dropped = jnp.zeros((), jnp.int32)
        for frac in pass_fracs[:Lk]:
            B_p = max(128, int(np.ceil(frac * R / 128)) * 128)
            m = (tau_tot < tau_max) & (cur < n_valid_r)
            plan = plan_packing(m[:, None], B_p)
            cc = jnp.minimum(cur, Lk - 1)[:, None]
            pair_tau, pair_rgb, pair_dep = field(
                pack(jnp.take_along_axis(n0, cc, 1)[:, 0], plan),
                pack(jnp.take_along_axis(n1, cc, 1)[:, 0], plan),
                pack(jnp.take_along_axis(pb, cc, 1)[:, 0], plan),
                pack(ridx, plan), plan.slot_valid)
            tau_r = unpack(pair_tau, plan).reshape(R)
            rgb_r = unpack(pair_rgb, plan).reshape(R, 3)
            dep_r = unpack(pair_dep, plan).reshape(R)
            rendered = m & plan.keep.reshape(R)
            T_bef = jnp.where(rendered, jnp.exp(-tau_tot), 0.0)
            rgb = rgb + T_bef[:, None] * rgb_r
            depth = depth + T_bef * dep_r
            tau_tot = tau_tot + jnp.where(rendered, tau_r, 0.0)
            cur = cur + rendered.astype(jnp.int32)
        # drain: every pair past each still-live ray's cursor in ONE
        # packed combine with carried transmittance (exact — the brick
        # analog of the oneshot renderer's straggler drain).  Without it,
        # rays outliving the pass list kept unrendered content
        # (measured -5 dB vs the single-pass path).
        live = tau_tot < tau_max
        col = jnp.arange(Lk, dtype=jnp.int32)[None]
        rest_valid = (col < n_valid_r[:, None]) & (col >= cur[:, None]) \
            & live[:, None]
        B_d = max(128, int(np.ceil(drain_frac * R / 128)) * 128)
        plan = plan_packing(rest_valid, B_d, sample_major=True)
        ray_of_pair = jnp.broadcast_to(ridx[:, None], (R, Lk))
        pair_tau, pair_rgb, pair_dep = field(
            pack(n0.reshape(-1), plan), pack(n1.reshape(-1), plan),
            pack(pb.reshape(-1), plan),
            pack(ray_of_pair.reshape(-1), plan), plan.slot_valid)
        tau_g = unpack(pair_tau, plan).reshape(R, Lk)
        rgb_g = unpack(pair_rgb, plan).reshape(R, Lk, 3)
        dep_g = unpack(pair_dep, plan).reshape(R, Lk)
        T_bef = jnp.exp(-(tau_tot[:, None] + jnp.cumsum(tau_g, -1)
                          - tau_g))
        liveg = T_bef > T_threshold
        Tl = jnp.where(liveg, T_bef, 0.0)
        rgb = rgb + (Tl[..., None] * rgb_g).sum(1)
        depth = depth + (Tl * dep_g).sum(1)
        tau_tot = tau_tot + jnp.where(liveg, tau_g, 0.0).sum(-1)
        dropped += jnp.maximum(plan.n_valid - B_d, 0).astype(jnp.int32)

    opacity = jnp.clip(1.0 - jnp.exp(-tau_tot), 0.0, 1.0)
    return dict(rgb=rgb, opacity=opacity, depth=depth,
                trunc_tiles=tile_over.sum().astype(jnp.int32),
                trunc_rays=(ray_over & (t2 > 0)).sum().astype(jnp.int32),
                pairs_dropped=dropped, pairs_total=pairs_total)


def render_brick(baked, cfg: NGPConfig, rays_o, rays_d, W, H, *,
                 bcfg: BakedConfig = BakedConfig(), tile: int = 8,
                 L: int = 256, Lk: int = 24, max_samples: int = 512,
                 T_threshold: float = 1e-2, chunk_tiles: int = 2048,
                 pairs_per_ray: float = 4.0, exp_step_factor: float = 0.0,
                 geometry=None, pass_fracs: tuple = (),
                 drain_frac: float = 0.25, macro_tiles: int = 8,
                 macro_L: int = 1024):
    """Full-frame brick renderer over (W*H) rays in image row-major order.

    `geometry`: optional cached output of brick_geometry(block_map) — pass
    it to avoid the host-side rebuild each frame."""
    lo, hi, pool_base = geometry if geometry is not None else \
        brick_geometry(baked["block_map"], bcfg, cfg)
    Wp = ((W + tile - 1) // tile) * tile
    Hp = ((H + tile - 1) // tile) * tile
    if (Wp, Hp) != (W, H):
        # edge-replicate the ray grid out to a tile multiple; the extra
        # rays render normally and are cropped from the output
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

    tpx = tile * tile
    n_tiles = (Wp * Hp) // tpx
    L = min(L, int(lo.shape[0]))
    Lk = min(Lk, L)
    # longest lattice window inside one brick: brick diagonal / dt
    vox_w = 2.0 * baked_extent(cfg) / bcfg.voxel_res
    S = int(np.ceil(bcfg.block * vox_w * SQRT3 / (SQRT3 / max_samples))) + 1
    outs = []
    # clamp the chunk to the actual tile count: padding is only for
    # equalizing a partial LAST chunk with its predecessors (one compiled
    # shape), never for inflating a small image up to chunk_tiles
    # (regression: a 64-tile frame padded to 2048 tiles renders 32x the
    # rays — minutes/frame on CPU, pure waste on TPU)
    cpr = max(min(int(chunk_tiles), n_tiles), 1)
    # hierarchical cull only pays when there are many more bricks than
    # macro candidates, but stays CORRECT with a clamped list; mt must
    # divide the chunk's tile count
    mL = min(macro_L, int(lo.shape[0]))
    mt = macro_tiles if mL > 0 else 0
    while mt > 1 and cpr % mt:
        mt //= 2
    for i in range(0, n_tiles, cpr):
        n_c = min(cpr, n_tiles - i)
        sl = slice(i * tpx, (i + n_c) * tpx)
        pad = (cpr - n_c) * tpx
        ro_c, rd_c = ro_t[sl], rd_t[sl]
        if pad:
            # pad rays originate far outside the scene box -> guaranteed
            # miss (t2=0), so they rasterize nothing and eat no pairs
            ro_c = jnp.concatenate([ro_c, jnp.full((pad, 3), 100.0)])
            rd_c = jnp.concatenate([rd_c, jnp.ones((pad, 3)) / SQRT3])
        outs.append(_render_tiles(
            baked["pool"], baked["rgb_mlp"], lo, hi, pool_base, ro_c, rd_c,
            cfg=cfg, bcfg=bcfg, tile=tile, L=L, Lk=Lk, S=S,
            max_samples=max_samples, T_threshold=T_threshold,
            pairs_budget=int(cpr * tpx * pairs_per_ray),
            pass_fracs=tuple(pass_fracs), drain_frac=drain_frac,
            macro_tiles=mt if mt > 1 else 0, macro_L=mL))
    cat = {k: jnp.concatenate([o[k] for o in outs])
           if outs[0][k].ndim else jnp.stack([o[k] for o in outs]).sum()
           for k in outs[0]}
    # per-chunk pair counts: budget sizing must key off the DENSEST chunk
    # (content concentrates in central chunks; a frame-mean budget starves
    # them — BENCH_r01 measured 560,930 dropped pairs at auto ppr 9.3)
    cat["pairs_per_chunk"] = jnp.stack([o["pairs_total"] for o in outs])

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
                trunc_rays=cat["trunc_rays"],
                pairs_dropped=cat["pairs_dropped"],
                pairs_total=cat["pairs_total"],
                pairs_per_chunk=cat["pairs_per_chunk"])
