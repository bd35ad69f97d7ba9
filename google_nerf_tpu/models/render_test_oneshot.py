"""One-shot test renderer: march every ray ONCE (train-style segment
march), stream-composite with a transmittance carry, then re-pass only the
straggler rays that had more content than one pass's capacity.

Why: the while-loop renderer (render_test_fast) re-marches a window and
runs a worst-case-padded field eval EVERY iteration for EVERY alive ray —
measured ~50x the content volume at 800^2 (~10 s/frame, and a baked field
changed nothing, proving iteration overhead dominates).  This renderer
does the march exactly once for ~95% of rays:

  pass 1: all rays, k samples each (3-phase march, budget-packed field,
          stream composite)
  pass 2+: alive stragglers compacted to chunk/straggler_div, resumed at
          their last sample position

Semantics: identical candidate lattice and compositing math as the other
renderers; a ray's passes anchor the lattice at its resume t (the
reference's iterative test marcher does the same,
`ngp_pl/models/rendering.py:71-101`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from google_nerf_tpu.models.ngp import NGPConfig, ngp_apply
from google_nerf_tpu.ops.compaction import pack, plan_packing
from google_nerf_tpu.ops.march_block import (block2_group,
                                             block_group as _auto_group,
                                             march_rays_train_block,
                                             march_rays_train_block2)
from google_nerf_tpu.ops.march_seg import march_rays_train_seg
from google_nerf_tpu.ops.ray_aabb import clamp_near, ray_aabb_intersect
from google_nerf_tpu.ops.stream_composite import composite_stream_train

SQRT3 = 3.0 ** 0.5
NEAR_DISTANCE = 0.05


@partial(jax.jit, static_argnames=("cfg", "T_threshold", "k", "n_keep",
                                   "n_keep_super", "sup", "n_keep_sup",
                                   "max_samples", "budget", "apply_fn",
                                   "march"))
def _render_pass(params, cfg: NGPConfig, occ_u8, rays_o, rays_d, t_cur, t2,
                 T_in, *, T_threshold: float, k: int, n_keep: int, sup: int,
                 n_keep_sup: int, max_samples: int, budget: int,
                 apply_fn=None, march: str = "seg",
                 n_keep_super: int = 0):
    """One march+composite pass from per-ray t_cur.  Returns per-pass
    accumulations (already scaled by T_in) and the updated carry."""
    field = apply_fn or ngp_apply
    R = rays_o.shape[0]
    dt = SQRT3 / max_samples
    hits = jnp.stack([jnp.where(t_cur < t2, t_cur, -1.0), t2], 1)
    if march == "block2":
        g2 = block2_group(max_samples, cfg.scale, cfg.grid_size)
        nkg = max(1, (n_keep * 8) // g2)
        # n_keep_super: 0 = derive from the group budget (+1 slack);
        # qs (max_samples // (g*8)) keeps ALL supers — exact spans, one
        # trip per ray unless the k-slot capacity overflows
        nks = n_keep_super or max(1, -(-nkg // 8) + 1)
        m = march_rays_train_block2(rays_o, rays_d, hits, occ_u8,
                                    scale=cfg.scale,
                                    grid_size=cfg.grid_size,
                                    max_samples=max_samples, k_samples=k,
                                    noise=jnp.zeros(R),
                                    n_keep_super=nks,
                                    n_keep_groups=nkg)
    elif march == "block":
        g = _auto_group(max_samples, cfg.scale, cfg.grid_size)
        # keep-window budget mirrors the seg path's n_keep*8 candidate
        # reach (see models/rendering.py block branch)
        m = march_rays_train_block(rays_o, rays_d, hits, occ_u8,
                                   scale=cfg.scale,
                                   grid_size=cfg.grid_size,
                                   max_samples=max_samples, k_samples=k,
                                   noise=jnp.zeros(R),
                                   n_keep_groups=max(1, (n_keep * 8) // g))
    else:
        m = march_rays_train_seg(rays_o, rays_d, hits, occ_u8,
                                 cascades=cfg.cascades, scale=cfg.scale,
                                 grid_size=cfg.grid_size,
                                 max_samples=max_samples, k_samples=k,
                                 noise=jnp.zeros(R), seg=8, n_keep=n_keep,
                                 sup=sup, n_keep_sup=n_keep_sup)
    K = m["ts"].shape[1]
    if budget and budget < R * K:
        plan = plan_packing(m["valid"], budget, sample_major=False)
        keep2d = plan.keep.reshape(R, K)
        processed = ~jnp.any(m["valid"] & ~keep2d, axis=-1)
        sig_p, rgb_p = field(params, cfg,
                             pack(m["xyzs"].reshape(-1, 3), plan),
                             pack(m["dirs"].reshape(-1, 3), plan))
        out = composite_stream_train(plan, sig_p, rgb_p,
                                     pack(m["deltas"].reshape(-1), plan),
                                     pack(m["ts"].reshape(-1), plan),
                                     R, K, T_threshold)
    else:
        # DENSE pass (budget 0/full): evaluate the field on every padded
        # slot and composite row-wise — no packing sort, no pack/unpack
        # gathers.  With a small per-pass k this trades a bounded amount
        # of wasted field work for the elimination of the per-pass
        # plan_packing sort (~R*k rows) and its gathers.
        sig, rgb_s = field(params, cfg, m["xyzs"].reshape(-1, 3),
                           m["dirs"].reshape(-1, 3))
        sig = sig.reshape(R, K)
        rgb_s = rgb_s.reshape(R, K, 3)
        sd = jnp.minimum(jnp.where(m["valid"], sig * m["deltas"], 0.0),
                         80.0)
        excl = jnp.cumsum(sd, axis=-1) - sd
        T_before = jnp.exp(-excl)
        alpha = 1.0 - jnp.exp(-sd)
        include = m["valid"] & (T_before > T_threshold)
        w = jnp.where(include, T_before * alpha, 0.0)
        out = dict(opacity=jnp.clip(w.sum(-1), 0.0, 1.0),
                   depth=(w * m["ts"]).sum(-1),
                   rgb=(w[..., None] * rgb_s).sum(-2),
                   tau=jnp.where(include, sd, 0.0).sum(-1),
                   t_last=jnp.max(jnp.where(m["valid"], m["ts"], 0.0),
                                  axis=-1))
        processed = jnp.ones((R,), bool)
    # scale this pass's contributions by the carried transmittance;
    # unprocessed (budget-dropped) rays contribute nothing and retry
    sc = jnp.where(processed, T_in, 0.0)
    T_new = jnp.where(processed, T_in * jnp.exp(-out["tau"]), T_in)
    # resume at the marcher's earliest-unexamined point, NOT t_last+dt:
    # a truncated pass can keep conservative segments with ZERO exact
    # samples (t_last would be 0 -> no progress -> the ray spins alive
    # forever, starving every higher-index ray out of the straggler pool)
    t_next = jnp.where(processed & m["truncated"],
                       jnp.minimum(m["t_resume"], t2), t2)
    t_next = jnp.where(processed, jnp.maximum(t_next, t_cur), t_cur)
    alive = (T_new > T_threshold) & (t_next < t2) \
        & (m["truncated"] | ~processed)
    return dict(rgb=sc[:, None] * out["rgb"], opacity=sc * out["opacity"],
                depth=sc * out["depth"], T=T_new, t_next=t_next,
                alive=alive)


def _straggler_pass(params, cfg, occ_u8, ro, rdu, t2, rgb, opacity, depth,
                    T, t_cur, alive, *, sr, budget, T_threshold, k, n_keep,
                    sup, n_keep_sup, max_samples, apply_fn, march,
                    n_keep_super=0):
    """One straggler pass: compact <=sr alive rays to the front (top_k),
    resume their march from t_cur, and scatter the results back (masked on
    is_real so slots beyond the true alive count are untouched).  The ONE
    copy of the select/render/scatter step used by the fixed-schedule
    loops and the while_loop drain."""
    N = ro.shape[0]
    iota = jnp.arange(N, dtype=jnp.int32)
    score = jnp.where(alive, -iota, jnp.int32(-(N + 1)))
    svals, ridx = jax.lax.top_k(score, sr)
    is_real = svals > -(N + 1)
    q = _render_pass(params, cfg, occ_u8, ro[ridx], rdu[ridx],
                     jnp.where(is_real, t_cur[ridx], jnp.inf),
                     jnp.where(is_real, t2[ridx], 0.0),
                     jnp.where(is_real, T[ridx], 0.0),
                     T_threshold=T_threshold, k=k, n_keep=n_keep, sup=sup,
                     n_keep_sup=n_keep_sup, max_samples=max_samples,
                     budget=budget, apply_fn=apply_fn, march=march,
                     n_keep_super=n_keep_super)

    def scat(full, add_or_new, mode="add"):
        cur = full[ridx]
        upd = cur + add_or_new if mode == "add" else add_or_new
        return full.at[ridx].set(
            jnp.where(is_real.reshape((-1,) + (1,) * (upd.ndim - 1)),
                      upd, cur), unique_indices=True)

    return (scat(rgb, q["rgb"]), scat(opacity, q["opacity"]),
            scat(depth, q["depth"]), scat(T, q["T"], "set"),
            scat(t_cur, q["t_next"], "set"),
            scat(alive, q["alive"] & is_real, "set"))



def render_test_oneshot(params, cfg: NGPConfig, occ_u8, rays_o, rays_d, *,
                        exp_step_factor: float = 0.0,
                        T_threshold: float = 1e-2, chunk: int = 131072,
                        k: int = 64, n_keep: int = 16, sup: int = 4,
                        n_keep_sup: int = 16, max_samples: int = 1024,
                        passes: int = 4, straggler_div: int = 4,
                        budget_div: int = 4, apply_fn=None,
                        pooled_stragglers: bool = True,
                        march: str = "seg", drain: bool = False,
                        max_passes: int = 1024,
                        compact_main: bool = False,
                        n_keep_super: int = 0,
                        drain_budget_div: int = 0):
    """Full-image one-shot renderer (bounded scenes).

    With `pooled_stragglers` (default), every chunk runs ONE main pass and
    the still-alive rays of the WHOLE image are then compacted into a
    single pool that the remaining `passes-1` straggler passes drain —
    instead of each chunk paying its own straggler passes regardless of
    how few of its rays are alive (image-wide alive counts after the main
    pass are typically a small fraction of one chunk).

    With `drain`, the fixed `passes-1` schedule is replaced by a
    `lax.while_loop` that keeps pulling up to chunk/straggler_div alive
    rays until NONE remain (bounded by `max_passes` for guaranteed
    termination, no host sync).  A fixed schedule starves at high
    resolution: after a k-sample main pass at 800^2, the alive content set
    (~1e5 rays needing 2-4 more passes) exceeds any affordable static
    pool x passes product, and every starved ray gets background blended
    over its missing tail — measured as a multi-dB PSNR loss.  The drain
    makes per-frame cost proportional to actual leftover content
    instead."""
    if drain and not pooled_stragglers:
        raise ValueError("drain=True requires pooled_stragglers=True "
                         "(the drain runs on the image-wide pool)")
    R = rays_o.shape[0]
    chunk = min(chunk, max(R, 1))
    pad = (-R) % chunk
    # pad rays originate far outside the AABB (guaranteed miss) so they
    # never march content, join the straggler pool, or extend drain trips
    ro = (jnp.concatenate([rays_o, jnp.full((pad, 3), 100.0)])
          if pad else rays_o)
    rd = jnp.concatenate([rays_d, jnp.ones((pad, 3))]) if pad else rays_d
    if not pooled_stragglers:
        outs = []
        for i in range(0, R + pad, chunk):
            outs.append(_render_chunk_oneshot(
                params, cfg, occ_u8, ro[i:i + chunk], rd[i:i + chunk],
                T_threshold=T_threshold, k=k, n_keep=n_keep, sup=sup,
                n_keep_sup=n_keep_sup, max_samples=max_samples,
                passes=passes, straggler_div=straggler_div,
                budget_div=budget_div, apply_fn=apply_fn, march=march))
        cat = {kk: jnp.concatenate([o[kk] for o in outs])[:R]
               for kk in outs[0]}
        bg = 1.0 if exp_step_factor == 0.0 else 0.0
        cat["rgb"] = cat["rgb"] + bg * (1.0 - cat["opacity"][:, None])
        return cat

    norm = jnp.linalg.norm(rd, axis=-1, keepdims=True)
    rdu = rd / jnp.where(norm > 0, norm, 1.0)
    if compact_main:
        # ---- compact main: no dense main pass at all.  One image-wide
        # phase-A scan (8 tiny gathers/ray from the ~4 KB super table)
        # marks the rays with ANY possible content; only those enter the
        # drain loop's render trips, so background rays never pay fine
        # marching or field evaluation.  Requires march="block2"+drain.
        if march != "block2" or not drain:
            raise ValueError("compact_main requires march='block2' and "
                             "drain=True")
        N = R + pad
        acc = _compact_scan(cfg, occ_u8, ro, rdu,
                            max_samples=max_samples)
        rgb = jnp.zeros((N, 3))
        opacity = jnp.zeros((N,))
        depth = jnp.zeros((N,))
        srvalidate = max(chunk // straggler_div, 1)
        rgb2, opacity2, depth2, trips = _drain_pool(
            params, cfg, occ_u8, ro, rdu, acc["t2"], rgb, opacity, depth,
            jnp.ones((N,)), acc["t_cur"], acc["alive"],
            sr=srvalidate, max_passes=max_passes,
            T_threshold=T_threshold, k=k, n_keep=n_keep, sup=sup,
            n_keep_sup=n_keep_sup, max_samples=max_samples,
            apply_fn=apply_fn, march=march, n_keep_super=n_keep_super,
            budget=(srvalidate * k // drain_budget_div
                    if drain_budget_div else 0))
        bg = 1.0 if exp_step_factor == 0.0 else 0.0
        out_rgb = rgb2[:R] + bg * (1.0 - opacity2[:R, None])
        return dict(rgb=out_rgb, opacity=opacity2[:R], depth=depth2[:R],
                    drain_trips=trips,
                    alive_after_main=jnp.sum(acc["alive"]).astype(jnp.int32))
    # ---- main pass per chunk ----
    parts = []
    for i in range(0, R + pad, chunk):
        parts.append(_main_pass_chunk(
            params, cfg, occ_u8, ro[i:i + chunk], rdu[i:i + chunk],
            T_threshold=T_threshold, k=k, n_keep=n_keep, sup=sup,
            n_keep_sup=n_keep_sup, max_samples=max_samples,
            budget=(chunk * k // budget_div if budget_div else 0),
            apply_fn=apply_fn, march=march))
    acc = {kk: jnp.concatenate([p[kk] for p in parts])
           for kk in parts[0]}
    rgb, opacity, depth = acc["rgb"], acc["opacity"], acc["depth"]
    T, t_cur, alive = acc["T"], acc["t_next"], acc["alive"]
    # ---- image-wide straggler pool ----
    N = R + pad
    sr = max(chunk // straggler_div, 1)
    if drain:
        rgb, opacity, depth, trips = _drain_pool(
            params, cfg, occ_u8, ro, rdu, acc["t2"], rgb, opacity, depth,
            T, t_cur, alive, sr=sr, max_passes=max_passes,
            T_threshold=T_threshold, k=k, n_keep=n_keep, sup=sup,
            n_keep_sup=n_keep_sup, max_samples=max_samples,
            apply_fn=apply_fn, march=march, n_keep_super=n_keep_super,
            budget=(sr * k // drain_budget_div if drain_budget_div else 0))
        bg = 1.0 if exp_step_factor == 0.0 else 0.0
        rgb = rgb[:R] + bg * (1.0 - opacity[:R, None])
        return dict(rgb=rgb, opacity=opacity[:R], depth=depth[:R],
                    drain_trips=trips,
                    alive_after_main=jnp.sum(alive).astype(jnp.int32))
    for _ in range(passes - 1):
        rgb, opacity, depth, T, t_cur, alive = _straggler_pass(
            params, cfg, occ_u8, ro, rdu, acc["t2"], rgb, opacity, depth,
            T, t_cur, alive, sr=sr,
            budget=(sr * k // max(budget_div // 2, 1) if budget_div else 0),
            T_threshold=T_threshold, k=k, n_keep=n_keep, sup=sup,
            n_keep_sup=n_keep_sup, max_samples=max_samples,
            apply_fn=apply_fn, march=march)
    bg = 1.0 if exp_step_factor == 0.0 else 0.0
    rgb = rgb[:R] + bg * (1.0 - opacity[:R, None])
    return dict(rgb=rgb, opacity=opacity[:R], depth=depth[:R])


@partial(jax.jit, static_argnames=("cfg", "max_samples"))
def _compact_scan(cfg: NGPConfig, occ2, ro, rdu, *, max_samples: int):
    """AABB clip + phase-A super scan for the compact-main renderer:
    per-ray entry t, exit t, and a conservative 'has any content' flag."""
    from google_nerf_tpu.ops.march_block import super_any_live
    hits = ray_aabb_intersect(ro, rdu, jnp.zeros(3),
                              jnp.full((3,), cfg.scale))
    hits = clamp_near(hits, NEAR_DISTANCE)
    t2 = jnp.where(hits[:, 1] > 0, hits[:, 1], 0.0)
    t_cur = jnp.where(hits[:, 0] >= 0, jnp.maximum(hits[:, 0], 0.0),
                      jnp.inf)
    alive = super_any_live(ro, rdu, hits, occ2, scale=cfg.scale,
                           grid_size=cfg.grid_size,
                           max_samples=max_samples)
    alive = alive & (t_cur < t2)
    return dict(t2=t2, t_cur=t_cur, alive=alive)


@partial(jax.jit, static_argnames=("sr", "max_passes", "cfg",
                                   "T_threshold", "k", "n_keep", "sup",
                                   "n_keep_sup", "max_samples", "apply_fn",
                                   "march", "n_keep_super", "budget"))
def _drain_pool(params, cfg, occ_u8, ro, rdu, t2, rgb, opacity, depth, T,
                t_cur, alive, *, sr, max_passes, T_threshold, k, n_keep,
                sup, n_keep_sup, max_samples, apply_fn, march,
                n_keep_super=0, budget: int = 0):
    """while_loop straggler drain: pull <=sr alive rays per trip (dense
    per-pass field eval, no packing sort) until no ray is alive or
    `max_passes` trips elapsed.

    The per-ray mutable state rides ONE (N, 8) array [rgb | opacity |
    depth | T | t_cur | alive] and the per-ray constants one (N, 7)
    [ro | rdu | t2], so each trip costs 2 fat row gathers + 1 fat row
    scatter instead of 6 narrow scatters + 11 narrow gathers — scatter
    runs at only 8-16 M rows/s on v5e (DESIGN_NOTES law), so the narrow
    form burned ~25-50 ms/trip on update traffic alone."""
    N = ro.shape[0]
    const = jnp.concatenate([ro, rdu, t2[:, None]], axis=1)
    state = jnp.concatenate(
        [rgb, opacity[:, None], depth[:, None], T[:, None],
         t_cur[:, None], alive.astype(jnp.float32)[:, None]], axis=1)
    iota = jnp.arange(N, dtype=jnp.int32)

    def cond(c):
        return (c[0] < max_passes) & jnp.any(c[1][:, 7] > 0.5)

    def body(c):
        i, state = c
        al = state[:, 7] > 0.5
        score = jnp.where(al, -iota, jnp.int32(-(N + 1)))
        svals, ridx = jax.lax.top_k(score, sr)
        is_real = svals > -(N + 1)
        cg = jnp.take(const, ridx, axis=0)
        sg = jnp.take(state, ridx, axis=0)
        q = _render_pass(params, cfg, occ_u8, cg[:, 0:3], cg[:, 3:6],
                         jnp.where(is_real, sg[:, 6], jnp.inf),
                         jnp.where(is_real, cg[:, 6], 0.0),
                         jnp.where(is_real, sg[:, 5], 0.0),
                         T_threshold=T_threshold, k=k, n_keep=n_keep,
                         sup=sup, n_keep_sup=n_keep_sup,
                         max_samples=max_samples, budget=budget,
                         apply_fn=apply_fn, march=march,
                         n_keep_super=n_keep_super)
        new = jnp.concatenate(
            [sg[:, 0:3] + q["rgb"], (sg[:, 3] + q["opacity"])[:, None],
             (sg[:, 4] + q["depth"])[:, None], q["T"][:, None],
             q["t_next"][:, None],
             (q["alive"] & is_real).astype(jnp.float32)[:, None]], axis=1)
        rows = jnp.where(is_real[:, None], new, sg)
        return i + 1, state.at[ridx].set(rows, unique_indices=True)

    trips, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return state[:, 0:3], state[:, 3], state[:, 4], trips


@partial(jax.jit, static_argnames=("cfg", "T_threshold", "k", "n_keep",
                                   "sup", "n_keep_sup", "max_samples",
                                   "budget", "apply_fn", "march"))
def _main_pass_chunk(params, cfg, occ_u8, rays_o, rays_du, *, T_threshold,
                     k, n_keep, sup, n_keep_sup, max_samples, budget,
                     apply_fn, march="seg"):
    """AABB clip + one render pass for a chunk of unit-direction rays;
    returns per-ray accumulators plus the (t2, t_next, T, alive) carry the
    pooled straggler passes need."""
    R = rays_o.shape[0]
    hits = ray_aabb_intersect(rays_o, rays_du, jnp.zeros(3),
                              jnp.full((3,), cfg.scale))
    hits = clamp_near(hits, NEAR_DISTANCE)
    t2 = jnp.where(hits[:, 1] > 0, hits[:, 1], 0.0)
    t_cur = jnp.where(hits[:, 0] >= 0, jnp.maximum(hits[:, 0], 0.0),
                      jnp.inf)
    p = _render_pass(params, cfg, occ_u8, rays_o, rays_du, t_cur, t2,
                     jnp.ones(R), T_threshold=T_threshold, k=k,
                     n_keep=n_keep, sup=sup, n_keep_sup=n_keep_sup,
                     max_samples=max_samples, budget=budget,
                     apply_fn=apply_fn, march=march)
    return dict(rgb=p["rgb"], opacity=p["opacity"], depth=p["depth"],
                T=p["T"], t_next=p["t_next"], alive=p["alive"], t2=t2)


def _render_chunk_oneshot(params, cfg, occ_u8, rays_o, rays_d, *,
                          T_threshold, k, n_keep, sup, n_keep_sup,
                          max_samples, passes, straggler_div, budget_div,
                          apply_fn, march="seg"):
    R = rays_o.shape[0]
    norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_du = rays_d / norm
    hits = ray_aabb_intersect(rays_o, rays_du, jnp.zeros(3),
                              jnp.full((3,), cfg.scale))
    hits = clamp_near(hits, NEAR_DISTANCE)
    t2 = jnp.where(hits[:, 1] > 0, hits[:, 1], 0.0)
    t_cur = jnp.where(hits[:, 0] >= 0, jnp.maximum(hits[:, 0], 0.0),
                      jnp.inf)

    p = _render_pass(params, cfg, occ_u8, rays_o, rays_du, t_cur, t2,
                     jnp.ones(R), T_threshold=T_threshold, k=k,
                     n_keep=n_keep, sup=sup, n_keep_sup=n_keep_sup,
                     max_samples=max_samples,
                     budget=(R * k // budget_div if budget_div else 0),
                     apply_fn=apply_fn, march=march)
    rgb, opacity, depth = p["rgb"], p["opacity"], p["depth"]
    T, t_cur, alive = p["T"], p["t_next"], p["alive"]

    sr = max(R // straggler_div, 1)
    for _ in range(passes - 1):
        rgb, opacity, depth, T, t_cur, alive = _straggler_pass(
            params, cfg, occ_u8, rays_o, rays_du, t2, rgb, opacity, depth,
            T, t_cur, alive, sr=sr,
            budget=(sr * k // max(budget_div // 2, 1) if budget_div else 0),
            T_threshold=T_threshold, k=k, n_keep=n_keep, sup=sup,
            n_keep_sup=n_keep_sup, max_samples=max_samples,
            apply_fn=apply_fn, march=march)

    return dict(rgb=rgb, opacity=opacity, depth=depth)
