"""One-phase BLOCK-ROW ray marching — the gather-minimal successor to the
two/three-phase segment marcher (ops/march_seg.py).

v5e measurement (DESIGN_NOTES.md microbench table): XLA row gathers are
row-COUNT bound (~130-160 M rows/s) with row width <~256 B essentially
free.  The segment marcher spends one 4-byte row per 8-candidate segment
in its coarse phase plus more rows in its exact phase, i.e. ~130-160
occupancy rows per ray at the flagship lattices.  This marcher instead
gathers one 64-byte row (16 int32 = the exact 8^3-block occupancy around
the group's min cell, grid.pack_occupancy_blocks) per group of 16-32
consecutive candidates:

  * ONE phase: the same row yields the exact per-candidate bit for every
    candidate in the group (word select is a 16-way one-hot multiply-sum
    on the VPU — no second gather), so the coarse/fine split and its
    dilated-occupancy conservatism disappear entirely;
  * per-ray occupancy gather rows drop to max_samples / group
    (32 rows at the flagship train lattice — ~4-5x fewer than the
    segment marcher) and the two phase-level `lax.top_k` compactions
    collapse to one small top_k over the group-liveness mask.

Sample positions are IDENTICAL to the dense-lattice marcher
(ops/marching.py, semantics of `vren.raymarching_train`,
reference `ngp_pl/models/custom_functions.py:78-101`) whenever a ray has
<= n_keep_groups live groups; truncation beyond that mirrors the
reference's own sample-budget truncation (custom_functions.py:92-97).

Constant-step single-cascade scenes only (exp_step_factor == 0,
cascades == 1); other scenes use march_seg / the dense marcher.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from google_nerf_tpu.ops.march_seg import _cell_index_single, _first_k

SQRT3 = 3.0 ** 0.5
BLOCK = 8
WORDS = BLOCK ** 3 // 32


def block_group(max_samples: int, scale: float, grid_size: int,
                cap: int = 32) -> int:
    """Largest power-of-2 divisor g of max_samples (<= cap) such that g
    consecutive candidates span <= BLOCK-1 cells per axis — then one
    8^3-block row anchored at the group's min cell contains the exact
    occupancy bit of every candidate."""
    dt = SQRT3 / max_samples
    bound = min(0.5, scale)
    cells_per_step = dt * grid_size / (2.0 * bound)
    g = 1
    while (2 * g <= cap and max_samples % (2 * g) == 0
           and (2 * g - 1) * cells_per_step < BLOCK - 1):
        g *= 2
    return g


def block2_group(max_samples: int, scale: float, grid_size: int,
                 stride: int = 4, cap: int = 32) -> int:
    """Largest power-of-2 divisor g of max_samples such that g consecutive
    candidates span <= BLOCK - stride - 1 cells per axis — then the 8^3
    block row anchored at the STRIDE-quantized floor of the group's min
    cell still contains every candidate's bit (anchor can sit up to
    stride-1 cells below the min cell)."""
    dt = SQRT3 / max_samples
    bound = min(0.5, scale)
    cells_per_step = dt * grid_size / (2.0 * bound)
    g = 1
    while (2 * g <= cap and max_samples % (2 * g) == 0
           and (2 * g - 1) * cells_per_step < BLOCK - stride):
        g *= 2
    return g


def super_window(max_samples: int, scale: float, grid_size: int,
                 sg: int = 8, stride: int = 4, sup_stride: int = 8) -> int:
    """Forward-window size (cells) the super-liveness table must cover for
    supergroups of sg fine groups: supergroup cell-span + anchor slack."""
    dt = SQRT3 / max_samples
    bound = min(0.5, scale)
    cells_per_step = dt * grid_size / (2.0 * bound)
    gs = block2_group(max_samples, scale, grid_size, stride) * sg
    return int(math.ceil((gs - 1) * cells_per_step)) + 1 + sup_stride


def pack_occupancy_block2(occ, *, max_samples: int, scale: float,
                          sg: int = 8, stride: int = 4,
                          sup_stride: int = 8):
    """Both tables the two-phase marcher needs, as a pytree dict."""
    from google_nerf_tpu.ops.grid import (pack_occupancy_blocks4,
                                          pack_super_liveness)
    G = occ.shape[1]
    return dict(
        blocks4=pack_occupancy_blocks4(occ, stride),
        super=pack_super_liveness(
            occ, super_window(max_samples, scale, G, sg, stride,
                              sup_stride), sup_stride))


def _phase_a_lives(sup_tab, o, d, t0, t2, hit, *, scale, grid_size,
                   dt, gs, qs, sup_stride):
    """Supergroup liveness from endpoint cells: (R, qs) bool + (R, qs) tsa."""
    Gq = grid_size // sup_stride
    s = jnp.arange(qs, dtype=jnp.float32)
    tsa = t0[:, None] + s[None, :] * (gs * dt)               # (R, qs)
    tsb = tsa + (gs - 1) * dt
    na = _cell_index_single(o[:, None, :] + tsa[..., None] * d[:, None, :],
                            scale, grid_size)
    nb = _cell_index_single(o[:, None, :] + tsb[..., None] * d[:, None, :],
                            scale, grid_size)
    msup = jnp.minimum(na, nb)                               # (R, qs, 3)
    a = jnp.clip(msup // sup_stride, 0, Gq - 1)
    sidx = (a[..., 0] * Gq + a[..., 1]) * Gq + a[..., 2]
    lives = (jnp.take(sup_tab, sidx, axis=0) > 0)            # (R, qs)
    return lives & (tsa < t2[:, None]) & hit[:, None], tsa


@partial(jax.jit, static_argnames=("scale", "grid_size", "max_samples",
                                   "sg", "stride", "sup_stride"))
def super_any_live(rays_o, rays_d, hits_t, occ2, *, scale: float,
                   grid_size: int, max_samples: int, sg: int = 8,
                   stride: int = 4, sup_stride: int = 8):
    """Phase-A-only scan: True iff ANY supergroup along the ray is live — a
    conservative superset of 'this ray has an occupied candidate'.  Costs
    max_samples/(g*sg) (~8) 4-byte gathers per ray from the ~4 KB super
    table; used by the compact-main oneshot renderer to exclude background
    rays from fine marching and field evaluation entirely."""
    dt = SQRT3 / max_samples
    g = block2_group(max_samples, scale, grid_size, stride)
    gs = g * sg
    t1, t2 = hits_t[:, 0], hits_t[:, 1]
    lives, _ = _phase_a_lives(
        occ2["super"], jax.lax.stop_gradient(rays_o),
        jax.lax.stop_gradient(rays_d), jnp.maximum(t1, 0.0), t2, t1 >= 0,
        scale=scale, grid_size=grid_size, dt=dt, gs=gs,
        qs=max_samples // gs, sup_stride=sup_stride)
    return lives.any(-1)


@partial(jax.jit, static_argnames=("scale", "grid_size", "max_samples",
                                   "k_samples", "sg", "n_keep_super",
                                   "n_keep_groups", "stride", "sup_stride"))
def march_rays_train_block2(rays_o, rays_d, hits_t, occ2, *, scale: float,
                            grid_size: int, max_samples: int,
                            k_samples: int, noise, sg: int = 8,
                            n_keep_super: int = 4, n_keep_groups: int = 0,
                            stride: int = 4, sup_stride: int = 8):
    """Two-phase block marcher -> padded (R, K) samples.

    Phase A (super): one 4-byte gather per supergroup of sg*g consecutive
    candidates from the ~4 KB pack_super_liveness table (anchored at the
    min of the supergroup's two ENDPOINT cells — positions are linear in
    t, so per-axis extremes are at the endpoints).  Only the first
    n_keep_super live supergroups descend; dead space costs qs (~8) tiny
    gathers per ray and ZERO per-candidate position math.

    Phase B (fine): exact per-candidate bits via one 64-byte block row per
    g-candidate group from the 2 MiB stride-anchored
    pack_occupancy_blocks4 table, then the same group-liveness compaction
    as march_rays_train_block.

    occ2: dict from pack_occupancy_block2 (same sg/stride/sup_stride).
    Sample positions are IDENTICAL to the dense marcher whenever no
    truncation occurs (the super table is a conservative superset);
    t_resume is exact-conservative for multi-pass renderers.
    Constant-step single-cascade scenes only."""
    blocks4, sup_tab = occ2["blocks4"], occ2["super"]
    R = rays_o.shape[0]
    dt = SQRT3 / max_samples
    g = block2_group(max_samples, scale, grid_size, stride)
    gs = g * sg
    qs = max_samples // gs
    nks = min(n_keep_super, qs)
    nk = min(n_keep_groups or max(1, -(-k_samples // g)), nks * sg)
    k_samples = min(k_samples, nk * g)
    Gq = grid_size // sup_stride
    Gs = grid_size // stride

    t1, t2 = hits_t[:, 0], hits_t[:, 1]
    hit = t1 >= 0
    t0 = jnp.maximum(t1, 0.0) + dt * noise
    o = jax.lax.stop_gradient(rays_o)
    d = jax.lax.stop_gradient(rays_d)

    # ---- phase A: supergroup liveness from endpoint cells ----
    # NOTE the liveness test is a BOUNDING-BOX test: a diagonal ray's
    # ~28-cell supergroup is tested as a ~28^3 cube, so rays passing NEAR
    # content go falsely live.  That is benign for SKIPPING (wasted fine
    # gathers) but poison for the TRUNCATION flag: backfill supervision
    # trusts `truncated`, and falsely-flagged near-surface background
    # rays lose exactly the supervision that clears fog (measured -5 dB
    # at the flagship A/B).  With nks >= qs phase A is skipped entirely:
    # every super is kept, truncation is exact (group-level only), and
    # the marcher's win is purely the 2 MiB fine table.
    if nks >= qs:
        pick_s = jnp.broadcast_to(jnp.arange(qs, dtype=jnp.int32), (R, qs))
        svalid = jnp.ones((R, qs), bool)
        trunc_sup = jnp.zeros((R,), bool)
        t_resume = jnp.full((R,), jnp.inf)
    else:
        lives, tsa = _phase_a_lives(sup_tab, o, d, t0, t2, hit,
                                    scale=scale, grid_size=grid_size,
                                    dt=dt, gs=gs, qs=qs,
                                    sup_stride=sup_stride)
        pick_s, svalid = _first_k(lives, nks)                # (R, nks)
        trunc_sup = lives.sum(-1) > nks
        t_resume = jnp.where(
            trunc_sup,
            t0 + (jnp.max(jnp.where(svalid, pick_s, -1), -1)
                  .astype(jnp.float32) + 1.0) * gs * dt, jnp.inf)

    # ---- phase B: exact bits inside kept supergroups ----
    j = jnp.arange(gs, dtype=jnp.float32)
    ts = (t0[:, None, None] + pick_s[..., None].astype(jnp.float32)
          * (gs * dt) + j * dt).reshape(R, nks * gs)         # ascending t
    xyz = o[:, None, :] + ts[..., None] * d[:, None, :]
    n = _cell_index_single(xyz, scale, grid_size)
    ng = n.reshape(R, nks * sg, g, 3)
    anchor = jnp.clip(ng.min(-2) // stride, 0, Gs - 1)       # (R, nks*sg, 3)
    widx = (anchor[..., 0] * Gs + anchor[..., 1]) * Gs + anchor[..., 2]
    rows = jnp.take(blocks4, widx.reshape(-1),
                    axis=0).reshape(R, nks * sg, WORDS)
    off = ng - (anchor * stride)[..., None, :]               # in {0..7}
    bitpos = (off[..., 0] * BLOCK + off[..., 1]) * BLOCK + off[..., 2]
    wsel = bitpos >> 5
    word = jnp.zeros_like(bitpos)
    for w in range(WORDS):
        word = word | jnp.where(wsel == w, rows[..., w][..., None], 0)
    occ_bit = ((word >> (bitpos & 31)) & 1) > 0              # (R, nks*sg, g)
    cand_ok = (occ_bit.reshape(R, nks, gs)
               & svalid[..., None]).reshape(R, nks * gs)
    cand_ok = cand_ok & (ts < t2[:, None]) & hit[:, None]

    # ---- group-liveness compaction (as march_rays_train_block) ----
    grp_ok = cand_ok.reshape(R, nks * sg, g)
    live = grp_ok.any(-1)
    pick, gvalid = _first_k(live, nk)                        # (R, nk)
    trunc_grp = live.sum(-1) > nk
    ts_grp0 = ts.reshape(R, nks * sg, g)[..., 0]             # group start t
    t_resume = jnp.minimum(t_resume, jnp.where(
        trunc_grp,
        jnp.max(jnp.where(gvalid,
                          jnp.take_along_axis(ts_grp0, pick, 1), 0.0), -1)
        + g * dt, jnp.inf))
    truncated = trunc_sup | trunc_grp
    sel = jnp.take_along_axis(grp_ok, pick[..., None], 1)    # (R, nk, g)
    ts_sel = jnp.take_along_axis(ts.reshape(R, nks * sg, g),
                                 pick[..., None], 1)
    cand = (sel & gvalid[..., None]).reshape(R, nk * g)
    ts_flat = jax.lax.stop_gradient(ts_sel).reshape(R, nk * g)

    if k_samples >= nk * g:
        valid = cand
        ts_out = jnp.where(valid, ts_flat, 0.0)
    else:
        idx, valid = _first_k(cand, k_samples)
        trunc2 = cand.sum(-1) > k_samples
        ts_out = jnp.where(valid, jnp.take_along_axis(ts_flat, idx, 1), 0.0)
        t_resume = jnp.minimum(t_resume, jnp.where(
            trunc2, jnp.max(jnp.where(valid, ts_out, 0.0), -1) + dt,
            jnp.inf))
        truncated = truncated | trunc2
    deltas = jnp.where(valid, dt, 0.0)
    xyzs = rays_o[:, None, :] + ts_out[..., None] * rays_d[:, None, :]
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
    return dict(xyzs=xyzs, dirs=dirs, deltas=deltas, ts=ts_out, valid=valid,
                truncated=truncated, t_resume=t_resume,
                total_samples=valid.sum())


@partial(jax.jit, static_argnames=("scale", "grid_size", "max_samples",
                                   "k_samples", "group", "n_keep_groups"))
def march_rays_train_block(rays_o, rays_d, hits_t, occ_blocks, *,
                           scale: float, grid_size: int, max_samples: int,
                           k_samples: int, noise, group: int = 0,
                           n_keep_groups: int = 0):
    """Constant-step one-phase block marcher -> padded (R, K) samples.

    occ_blocks: (G^3, 16) int32 from grid.pack_occupancy_blocks.
    Returns the same dict as ops.marching.march_rays_train /
    ops.march_seg.march_rays_train_seg.
    """
    R = rays_o.shape[0]
    dt = SQRT3 / max_samples
    g = group or block_group(max_samples, scale, grid_size)
    q = max_samples // g
    nk = min(n_keep_groups or max(1, -(-k_samples // g)), q)
    k_samples = min(k_samples, nk * g)

    t1, t2 = hits_t[:, 0], hits_t[:, 1]
    hit = t1 >= 0
    t0 = jnp.maximum(t1, 0.0) + dt * noise
    j = jnp.arange(max_samples, dtype=jnp.float32)
    ts = t0[:, None] + j[None, :] * dt                       # (R, ms)
    o = jax.lax.stop_gradient(rays_o)
    d = jax.lax.stop_gradient(rays_d)
    xyz = o[:, None, :] + ts[..., None] * d[:, None, :]
    n = _cell_index_single(jax.lax.stop_gradient(xyz), scale, grid_size)
    ng = n.reshape(R, q, g, 3)
    anchor = jnp.minimum(ng.min(-2), grid_size - BLOCK)      # (R, q, 3)
    widx = (anchor[..., 0] * grid_size
            + anchor[..., 1]) * grid_size + anchor[..., 2]
    rows = jnp.take(occ_blocks, widx.reshape(-1),
                    axis=0).reshape(R, q, WORDS)
    off = ng - anchor[..., None, :]                          # in {0..7}
    bitpos = (off[..., 0] * BLOCK + off[..., 1]) * BLOCK + off[..., 2]
    wsel = bitpos >> 5
    # word select over the 16 gathered words: unrolled masked-OR on the
    # VPU (a take_along_axis here would be another R*ms-row gather)
    word = jnp.zeros_like(bitpos)
    for w in range(WORDS):
        word = word | jnp.where(wsel == w, rows[..., w][..., None], 0)
    occ_bit = ((word >> (bitpos & 31)) & 1) > 0              # (R, q, g)
    cand_ok = (occ_bit.reshape(R, max_samples) & (ts < t2[:, None])
               & hit[:, None])

    # group-liveness compaction: keep the first nk live groups per ray
    grp_ok = cand_ok.reshape(R, q, g)
    live = grp_ok.any(-1)
    pick, gvalid = _first_k(live, nk)                        # (R, nk)
    truncated = live.sum(-1) > nk
    # resume point for multi-pass renderers: unexamined content starts
    # past the last kept group (kept groups are fully examined; group
    # liveness here is EXACT, but the uniform t_resume contract matches
    # march_seg and skips re-testing the dead tail of the last group)
    t_resume = jnp.where(
        truncated,
        t0 + (jnp.max(jnp.where(gvalid, pick, -1), -1)
              .astype(jnp.float32) + 1.0) * g * dt, jnp.inf)
    sel = jnp.take_along_axis(grp_ok, pick[..., None], 1)    # (R, nk, g)
    ts_sel = jnp.take_along_axis(ts.reshape(R, q, g), pick[..., None], 1)
    cand = (sel & gvalid[..., None]).reshape(R, nk * g)
    # ts carries no pose gradient (matches march_seg: pose refinement flows
    # through rays_o/rays_d in the xyz reconstruction below only)
    ts_flat = jax.lax.stop_gradient(ts_sel).reshape(R, nk * g)

    if k_samples >= nk * g:
        # full capacity: skip the per-row first-k sort (valid slots stay
        # in ascending-t flat order, all downstream requires — same
        # convention as march_seg's full-capacity path)
        valid = cand
        ts_out = jnp.where(valid, ts_flat, 0.0)
    else:
        idx, valid = _first_k(cand, k_samples)
        trunc2 = cand.sum(-1) > k_samples
        ts_out = jnp.where(valid, jnp.take_along_axis(ts_flat, idx, 1), 0.0)
        t_resume = jnp.minimum(t_resume, jnp.where(
            trunc2, jnp.max(jnp.where(valid, ts_out, 0.0), -1) + dt,
            jnp.inf))
        truncated = truncated | trunc2
    deltas = jnp.where(valid, dt, 0.0)
    xyzs = rays_o[:, None, :] + ts_out[..., None] * rays_d[:, None, :]
    dirs = jnp.broadcast_to(rays_d[:, None, :], xyzs.shape)
    return dict(xyzs=xyzs, dirs=dirs, deltas=deltas, ts=ts_out, valid=valid,
                truncated=truncated, t_resume=t_resume,
                total_samples=valid.sum())
