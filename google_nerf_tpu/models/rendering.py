"""Ray rendering: training forward pass and test-time iterative renderer.

TPU-native rebuild of `ngp_pl/models/rendering.py`:
  * render/train (`__render_rays_train:118-165`): AABB clip -> march ->
    model -> composite -> background, as ONE fused jitted graph over padded
    (R, K) tensors (the reference's per-step `total_samples` host readback is
    designed away).
  * render/test (`__render_rays_test:43-114`): the host-synced alive-ray
    while loop becomes a `lax.while_loop` over fixed-shape rounds with masked
    alive state and per-ray resume positions (no host sync per iteration).

MAX_SAMPLES=1024 and NEAR_DISTANCE=0.05 as in the reference (`rendering.py:7-8`).
exp_step_factor=1/256 for unbounded colmap/nerfpp scenes (`train.py:81-82`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from google_nerf_tpu.models.ngp import NGPConfig, ngp_apply
from google_nerf_tpu.ops.compaction import pack, plan_packing, unpack
from google_nerf_tpu.ops.composite import (composite_rays_test_round,
                                           composite_rays_train)
from google_nerf_tpu.ops.stream_composite import composite_stream_train
from google_nerf_tpu.ops.marching import (march_rays_test_round,
                                          march_rays_train)
from google_nerf_tpu.ops.march_block import (block2_group, block_group as
                                             auto_block_group,
                                             march_rays_train_block,
                                             march_rays_train_block2)
from google_nerf_tpu.ops.march_seg import march_rays_train_seg
from google_nerf_tpu.ops.ray_aabb import clamp_near, ray_aabb_intersect

MAX_SAMPLES = 1024
NEAR_DISTANCE = 0.05


def _background(exp_step_factor: float):
    # synthetic scenes composite onto white, unbounded onto black
    return 1.0 if exp_step_factor == 0.0 else 0.0


def render_train(params, cfg: NGPConfig, occ_grid, rays_o, rays_d, key, *,
                 exp_step_factor: float = 0.0, T_threshold: float = 1e-4,
                 k_samples: int = 128, max_samples: int = MAX_SAMPLES,
                 samples_budget: int = 0, occ_u8=None, march: str = "seg",
                 seg: int = 8,
                 n_keep: int = 32, sup: int = 0, n_keep_sup: int = 12,
                 block_group: int = 0, n_keep_groups: int = 0,
                 bg_color=None, exclude_incomplete: str = "none",
                 incomplete_floor: float = 0.5, backfill_rgb=None,
                 backfill_enable=None, stream: bool = True):
    """Training-time render. rays_o/rays_d: (R, 3), rays_d need not be unit.

    Returns dict: rgb (R,3), opacity, depth, depth_sq (R,), total_samples,
    valid mask (R, K) (for telemetry).
    """
    norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_du = rays_d / norm
    hits = ray_aabb_intersect(rays_o, rays_du, jnp.zeros(3),
                              jnp.full((3,), cfg.scale))
    hits = clamp_near(hits, NEAR_DISTANCE)
    noise = jax.random.uniform(key, (rays_o.shape[0],))
    if occ_u8 is not None and exp_step_factor == 0.0 and march == "block2":
        # two-phase block marcher (ops/march_block.py): tiny-table super
        # liveness prunes dead space before any candidate math; fine bits
        # come from the 2 MiB stride-4 block table.  Keep budgets mirror
        # the block branch below (same group size, so same reach).
        g = block2_group(max_samples, cfg.scale, cfg.grid_size)
        nkg = n_keep_groups or max(1, (n_keep * seg) // g)
        # TRAIN keeps ALL supergroups: phase A's bounding-box liveness is
        # conservative for skipping but its truncation flag has false
        # positives that poison backfill supervision (measured -5 dB,
        # see march_block.py phase-A note).  The marcher's win at train
        # is the 2 MiB stride-4 fine table, not the skip.
        nks = max(1, max_samples // (g * 8))
        m = march_rays_train_block2(rays_o, rays_du, hits, occ_u8,
                                    scale=cfg.scale,
                                    grid_size=cfg.grid_size,
                                    max_samples=max_samples,
                                    k_samples=k_samples, noise=noise,
                                    n_keep_super=nks, n_keep_groups=nkg)
    elif occ_u8 is not None and exp_step_factor == 0.0 and march == "block":
        # one-phase block-row marcher (ops/march_block.py).  The default
        # keep-window budget matches the segment marcher's reach
        # (n_keep segments x seg candidates), NOT k_samples//group — a
        # window budget below the seg marcher's truncates content rays
        # far more aggressively (measured: train collapses, mask_frac 0.6)
        g = block_group or auto_block_group(max_samples, cfg.scale,
                                            cfg.grid_size)
        nkg = n_keep_groups or max(1, (n_keep * seg) // g)
        m = march_rays_train_block(rays_o, rays_du, hits, occ_u8,
                                   scale=cfg.scale,
                                   grid_size=cfg.grid_size,
                                   max_samples=max_samples,
                                   k_samples=k_samples, noise=noise,
                                   group=g, n_keep_groups=nkg)
    elif occ_u8 is not None and exp_step_factor == 0.0:
        # gather-minimal two-phase marcher (ops/march_seg.py)
        m = march_rays_train_seg(rays_o, rays_du, hits, occ_u8,
                                 cascades=cfg.cascades, scale=cfg.scale,
                                 grid_size=cfg.grid_size,
                                 max_samples=max_samples,
                                 k_samples=k_samples, noise=noise,
                                 seg=seg, n_keep=n_keep, sup=sup,
                                 n_keep_sup=n_keep_sup)
    else:
        m = march_rays_train(rays_o, rays_du, hits, occ_grid,
                             cascades=cfg.cascades, scale=cfg.scale,
                             exp_step_factor=exp_step_factor,
                             grid_size=cfg.grid_size,
                             max_samples=max_samples,
                             k_samples=k_samples, noise=noise)
    R, K = m["ts"].shape
    ray_mask = jnp.ones((R,), bool)
    if samples_budget and samples_budget < R * K:
        # evaluate the field only on (up to budget) REAL samples — the
        # TPU-native stand-in for the reference's CSR compaction.  Packing
        # is ray-major; rays whose samples did not all fit are flagged in
        # ray_mask=False and must be EXCLUDED from the loss (their render
        # is incomplete) — gradients then stay unbiased and the budget acts
        # as a dynamic batch-size cap, exactly like training on fewer rays.
        plan = plan_packing(m["valid"], samples_budget, sample_major=False)
        keep2d = plan.keep.reshape(R, K)
        ray_mask = ~jnp.any(m["valid"] & ~keep2d, axis=-1)
        # ONE fat 8-wide pack gather (xyz | dir | delta | t) instead of four
        # narrow ones: gather cost on v5e is per-ROW for widths <= 256 B
        # (DESIGN_NOTES gather law), so this quarters the pack row count.
        feat = jnp.concatenate(
            [m["xyzs"].reshape(-1, 3), m["dirs"].reshape(-1, 3),
             m["deltas"].reshape(-1, 1), m["ts"].reshape(-1, 1)], axis=1)
        fp = pack(feat, plan)
        sig_p, rgb_p = ngp_apply(params, cfg, fp[:, :3], fp[:, 3:6])
        if stream:
            # composite in the packed stream (B rows) instead of unpacking
            # to the padded (R, K) grid — ~3 full R*K passes saved
            out = composite_stream_train(
                plan, sig_p, rgb_p, fp[:, 6], fp[:, 7], R, K, T_threshold)
        else:
            sigmas = unpack(sig_p, plan).reshape(R, K)
            rgbs = unpack(rgb_p, plan).reshape(R, K, 3)
            out = composite_rays_train(sigmas, rgbs, m["deltas"], m["ts"],
                                       m["valid"], T_threshold)
    else:
        sigmas, rgbs = ngp_apply(params, cfg, m["xyzs"].reshape(-1, 3),
                                 m["dirs"].reshape(-1, 3))
        sigmas = sigmas.reshape(R, K)
        rgbs = rgbs.reshape(R, K, 3)
        out = composite_rays_train(sigmas, rgbs,
                                   m["deltas"], m["ts"], m["valid"],
                                   T_threshold)
    if exclude_incomplete == "backfill" and "truncated" in m:
        # Truncation-bias fix WITHOUT dropping rays: a truncated ray whose
        # transmittance never converged has an incomplete render C_prefix +
        # T_end*bg; supervising that against gt pushes the prefix to explain
        # the whole pixel -> near-camera fog (measured: sigma_q99 ~500 at
        # k=64).  Hard exclusion instead unsupervises exactly the content
        # rays and collapses the scene (measured: occ -> 0.09, test 13 dB).
        # Backfill composites the RESIDUAL TRANSMITTANCE ONTO THE GT PIXEL
        # for those rays: pred = C_prefix + T_end*gt.  An empty prefix gives
        # pred == gt (zero loss, zero pressure to invent content) while
        # spurious prefix fog still contradicts the pixel and is cleared.
        # Gradient bias toward false content is removed; no supervision is
        # thrown away.  (backfill_rgb: the final, bg-recomposited target.)
        # During grid warmup EVERY ray is truncated (fully-occupied grid);
        # backfilling then would never let content build (measured: training
        # stalls with an empty scene).  `backfill_enable` (traced bool, e.g.
        # step >= warmup_steps) keeps full supervision through warmup and
        # turns the bias-free backfill on once truncation is the exception.
        unconverged = out["opacity"] < 1.0 - T_threshold
        fill = m["truncated"] & unconverged
        if backfill_enable is not None:
            fill = fill & backfill_enable
        if backfill_rgb is not None:
            bgb = jnp.broadcast_to(bg_color if bg_color is not None
                                   else _background(exp_step_factor),
                                   backfill_rgb.shape)
            bg_color = jnp.where(fill[:, None], backfill_rgb, bgb)
    elif exclude_incomplete != "none" and "truncated" in m:
        # A ray whose march dropped real content (k_samples/n_keep caps)
        # AND whose transmittance never converged has an incompletely
        # rendered color: supervising it biases gradients toward explaining
        # the pixel with only the near content.  Fog inflates occupancy and
        # hence selects exactly the foggy rays for this bias (the reference
        # never truncates per-ray: it marches to T<thresh or t2,
        # `rendering.py:71-101`), so such rays are excluded from the loss.
        # Mode "floor": exclusion engages only while it keeps at least
        # `incomplete_floor` of the batch — during occupancy-grid warmup
        # (grid fully occupied) nearly EVERY ray is truncated+unconverged
        # and hard exclusion would starve training entirely.
        unconverged = out["opacity"] < 1.0 - T_threshold
        surv = ray_mask & ~(m["truncated"] & unconverged)
        if exclude_incomplete == "hard":
            ray_mask = surv
        else:
            # fraction relative to rays the budget kept, so heavy budget
            # masking early in training doesn't permanently disable this
            frac = surv.sum() / jnp.maximum(ray_mask.sum(), 1)
            ray_mask = jnp.where(frac >= incomplete_floor, surv, ray_mask)
    bg = _background(exp_step_factor) if bg_color is None else bg_color
    out["rgb"] = out["rgb"] + bg * (1.0 - out["opacity"][:, None])
    out["total_samples"] = m["total_samples"]
    out["valid"] = m["valid"]
    out["ray_mask"] = ray_mask
    return out


@partial(jax.jit, static_argnames=("cfg", "exp_step_factor", "T_threshold",
                                   "n_cand", "k_samples", "max_rounds",
                                   "max_samples"))
def _render_test_chunk(params, cfg: NGPConfig, occ_grid, rays_o, rays_d, *,
                       exp_step_factor: float, T_threshold: float,
                       n_cand: int, k_samples: int, max_rounds: int,
                       max_samples: int = MAX_SAMPLES):
    R = rays_o.shape[0]
    norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_du = rays_d / norm
    hits = ray_aabb_intersect(rays_o, rays_du, jnp.zeros(3),
                              jnp.full((3,), cfg.scale))
    hits = clamp_near(hits, NEAR_DISTANCE)
    t2 = hits[:, 1]

    def cond(st):
        rounds, _, _, alive, *_ = st
        return (rounds < max_rounds) & alive.any()

    def body(st):
        rounds, t_cur, T, alive, opacity, depth, rgb = st
        m = march_rays_test_round(rays_o, rays_du, t_cur, t2, alive, occ_grid,
                                  cascades=cfg.cascades, scale=cfg.scale,
                                  exp_step_factor=exp_step_factor,
                                  grid_size=cfg.grid_size,
                                  max_samples=max_samples, n_cand=n_cand,
                                  k_samples=k_samples)
        sig, col = ngp_apply(params, cfg, m["xyzs"].reshape(-1, 3),
                             m["dirs"].reshape(-1, 3))
        T, opacity, depth, rgb = composite_rays_test_round(
            sig.reshape(R, k_samples), col.reshape(R, k_samples, 3),
            m["deltas"], m["ts"], m["valid"], T, opacity, depth, rgb,
            T_threshold)
        t_next = m["t_next"]
        alive = alive & (T > T_threshold) & (t_next < t2)
        return rounds + 1, t_next, T, alive, opacity, depth, rgb

    init = (jnp.int32(0), jnp.maximum(hits[:, 0], 0.0), jnp.ones(R),
            hits[:, 0] >= 0, jnp.zeros(R), jnp.zeros(R), jnp.zeros((R, 3)))
    _, _, T, _, opacity, depth, rgb = jax.lax.while_loop(cond, body, init)

    bg = _background(exp_step_factor)
    rgb = rgb + bg * (1.0 - opacity[:, None])
    return dict(rgb=rgb, opacity=opacity, depth=depth)


def render_test(params, cfg: NGPConfig, occ_grid, rays_o, rays_d, *,
                exp_step_factor: float = 0.0, T_threshold: float = 1e-4,
                chunk: int = 65536, n_cand: int = 128, k_samples: int = 32,
                max_samples: int = MAX_SAMPLES):
    """Full test-time render; chunks rays to bound memory.

    The round budget mirrors the reference's MAX_SAMPLES=1024 total-march
    bound (`rendering.py:71`): each round consumes >= k_samples candidates
    for a live ray, so max_rounds = MAX_SAMPLES // k_samples (+ slack for
    empty-space windows which consume n_cand each).
    """
    R = rays_o.shape[0]
    max_rounds = max_samples // k_samples + max_samples // n_cand + 4
    outs = []
    pad = (-R) % chunk
    ro = jnp.concatenate([rays_o, jnp.zeros((pad, 3))]) if pad else rays_o
    rd = jnp.concatenate(
        [rays_d, jnp.ones((pad, 3))]) if pad else rays_d
    for i in range(0, R + pad, chunk):
        outs.append(_render_test_chunk(
            params, cfg, occ_grid, ro[i:i + chunk], rd[i:i + chunk],
            exp_step_factor=exp_step_factor, T_threshold=T_threshold,
            n_cand=n_cand, k_samples=k_samples, max_rounds=max_rounds,
            max_samples=max_samples))
    cat = {k: jnp.concatenate([o[k] for o in outs])[:R] for k in outs[0]}
    return cat
