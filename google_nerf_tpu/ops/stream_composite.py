"""Front-to-back compositing directly over the ray-major packed sample
stream — the budget-branch replacement for unpack + padded (R, K) composite.

Why: with the capacity recipe (K=256) the padded path costs ~3 full passes
over R*K = 2.1M slots (two `unpack` gathers + their VJPs + the padded
cumsum) while only <= budget (131k) slots are real.  Ray-major packing
(ops/compaction.py, sample_major=False) keeps each kept ray's samples
CONTIGUOUS and in marching order inside the budget stream, so the whole
composite runs on (B,) arrays:

  * per-slot transmittance: inclusive cumsum of sigma*dt minus the value
    carried at the ray's first slot (recovered with a boundary cummax —
    valid because the cumsum is nondecreasing);
  * per-ray reductions: cumsum-at-ray-end differences (R gathers).

Semantics match ops/composite.composite_rays_train exactly for rays whose
samples were all kept (ray_mask True); non-kept rays return zeros (they are
excluded from the loss anyway).  Gradients flow via XLA autodiff exactly as
in the padded path.

Reference analog: `vren.composite_train_fw/bw` over the CSR sample stream
(`ngp_pl/models/custom_functions.py:116-159`) — this IS the CSR layout,
rebuilt with static shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def composite_stream_train(plan, sig_p, rgb_p, dt_p, ts_p, R: int, K: int,
                           T_threshold: float = 1e-4):
    """plan: ray-major PackPlan over a (R, K) valid grid; entries may be
    scattered within a row but must be in ascending-t flat order (all
    marchers guarantee this).
    sig_p (B,), rgb_p (B, 3), dt_p (B,), ts_p (B,): packed per-sample data.
    Returns dict: opacity, depth, depth_sq (R,), rgb (R, 3).
    """
    B = sig_p.shape[0]
    sv = plan.slot_valid
    # slot -> ray id; invalid tail slots get sentinel R (keeps ids sorted)
    rid = jnp.where(sv, plan.src_idx // K, R)

    # optical depth per slot, capped: exp(-80) is 1.8e-35 (0 vs any
    # T_threshold) and 1-exp(-x) saturates to 1.0 in f32 beyond x~17, so
    # the cap changes no observable output — but it keeps a TruncExp
    # overflow (sigma = inf on one bad training step) from poisoning the
    # stream-wide cumsums below with inf - inf = NaN for every LATER ray.
    sd = jnp.minimum(jnp.where(sv, sig_p * dt_p, 0.0), 80.0)
    # per-ray exclusive optical-depth prefix via a SEGMENTED (reset at ray
    # boundary) scan.  The earlier formulation subtracted a global-cumsum
    # carry (excl - start_val), which (a) turns one inf slot into NaN for
    # all later rays and (b) loses precision late in the stream once the
    # global cumsum grows past ~1e5 (catastrophic cancellation in f32).
    boundary = jnp.concatenate([jnp.ones((1,), bool), rid[1:] != rid[:-1]])

    def combine(a, b):
        s1, r1 = a
        s2, r2 = b
        return jnp.where(r2, s2, s1 + s2), r1 | r2

    seg_incl, _ = jax.lax.associative_scan(combine, (sd, boundary))
    T_before = jnp.exp(-(seg_incl - sd))
    alpha = 1.0 - jnp.exp(-sd)
    include = sv & (T_before > T_threshold)
    w = jnp.where(include, T_before * alpha, 0.0)

    # per-ray [start, end] slot range.  Kept samples of a ray occupy a
    # contiguous slot run (ray-major packing preserves flat order) but may
    # be SCATTERED within the (R, K) row (the marcher's full-capacity path
    # skips prefix compaction), so locate the first/last kept flat index
    # per row explicitly.
    keep2d = plan.keep.reshape(R, K)
    kidx = jax.lax.broadcasted_iota(jnp.int32, (R, K), 1)
    first_f = jnp.min(jnp.where(keep2d, kidx, K), axis=-1)
    last_f = jnp.max(jnp.where(keep2d, kidx, -1), axis=-1)
    count = keep2d.sum(-1)
    has = count > 0
    base = jnp.arange(R, dtype=jnp.int32) * K
    start = jnp.take(plan.pos, base + jnp.where(has, first_f, 0))
    last = jnp.take(plan.pos, base + jnp.where(has, last_f, 0))

    # ALL seven per-ray reductions ride ONE (B, 7) cumsum + two (R, 7)-row
    # gathers (instead of 7 scalar cumsums + 14 narrow gathers): lanes are
    # free on the VPU and gather cost is per-row for widths <= 256 B.
    lanes = jnp.stack(
        [w, w * ts_p, w * ts_p * ts_p,
         w * rgb_p[:, 0], w * rgb_p[:, 1], w * rgb_p[:, 2],
         jnp.where(include, sd, 0.0)], axis=-1)
    vc = jnp.cumsum(lanes, axis=0)
    hi = jnp.take(vc, last, axis=0)
    lo_idx = jnp.maximum(start - 1, 0)
    lo = jnp.where((start > 0)[:, None], jnp.take(vc, lo_idx, axis=0), 0.0)
    sums = jnp.where(has[:, None], hi - lo, 0.0)

    # hi - lo of a global cumsum can cancel to a TINY NEGATIVE for empty
    # rays; downstream -o*log(o) entropy would then be NaN.  w >= 0, so
    # clamping to [0, 1] only removes rounding error.
    opacity = jnp.clip(sums[:, 0], 0.0, 1.0)
    depth = sums[:, 1]
    depth_sq = sums[:, 2]
    rgb = sums[:, 3:6]
    # aux for multi-pass rendering: per-ray included optical depth (gives
    # the transmittance multiplier exp(-tau)) and last kept sample t
    tau = sums[:, 6]
    t_last = jnp.where(has, jnp.take(ts_p, last), 0.0)
    return dict(opacity=opacity, depth=depth, depth_sq=depth_sq, rgb=rgb,
                tau=tau, t_last=t_last)
