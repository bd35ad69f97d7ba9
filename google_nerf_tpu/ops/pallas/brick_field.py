"""MXU brick-field kernel — the serving field evaluator as matmuls.

Why this exists (the measured wall it removes): every XLA serving
renderer here pays ONE fat pool-row gather per sample (256 B holding the
voxel's 8 trilinear corners, models/baked.py).  At 800^2 that is tens of
millions of gather rows/frame against a pool working set of GiB scale —
the worst regime of the v5e gather law (~2.5-4.6 GB/s effective,
DESIGN_NOTES round 7), which caps the brick renderer at <1 FPS no matter
how the pairs are scheduled.

This kernel inverts the memory pattern so NO per-sample gather exists:

  * grid = (tiles, list-slots); each step's BlockSpec index map (scalar-
    prefetched pool-block ids) DMAs ONE brick's entire pool slab
    (512 voxel rows x 128 lanes = all 8 corners x 16 features) into
    VMEM — a contiguous copy at HBM streaming bandwidth, auto
    double-buffered by the Mosaic pipeline;
  * each of the tile's 64 rays slab-tests the brick and lays its lattice
    window (<= S samples) — dense VPU arithmetic;
  * trilinear interpolation becomes a (64, 512) one-hot x (512, 128)
    slab MATMUL per window slot: the one-hot row selects the sample's
    voxel row, the matmul lands all 8 corner feature vectors at once,
    and a constant (128, 16) group-reduce matmul applies the corner
    weights.  The "gather" now runs on the MXU at matmul rates;
  * the rgb MLP (32->64->64->3, models/mlp.py) runs in-kernel on the
    window's samples, and the window composite + per-ray transmittance
    carry accumulate in the revisited output block, so a tile whose rays
    have all saturated (T < T_threshold) SKIPS the remaining bricks in
    its front-to-back list — early ray termination at brick granularity
    with zero host syncs (reference analog `ngp_pl/models/rendering.py:
    99,157`).

Ordering semantics: pairs composite in the tile list's front-to-back
order (center depth along the tile cone axis).  For disjoint brick AABBs
this matches each ray's entry order except for near-ties at equal depth;
the renderer-level agreement test bounds the resulting tolerance
(tests/test_render_brick_mxu.py).

Pallas notes (ops/pallas/__init__.py records why earlier kernels lost):
this kernel uses none of the unsupported patterns — no vectorized VMEM
gather, no scatter; only block DMA via scalar-prefetch index maps,
iota/compare one-hots, and MXU dots.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TPX = 64          # rays per tile (8x8) — fixed by the raster design
VOX = 512         # pool rows per brick (block=8 -> 8^3)
ROWW = 128        # pool row lanes (8 corners x 16 features)
FEAT = 16


def _kernel(pb_ref, vld_ref, meta_ref, rays_ref, sh_ref, slab_ref, w1_ref,
            w2_ref, w3_ref, out_ref, *, Lp: int, S: int,
            dt: float, inv2s: float, V: int, tau_max: float):
    """One (tile t, list slot l) grid step; out block revisited across l.

    The whole window is evaluated as ONE batch of N = S*64 samples laid
    out s-major (row j = s*64 + r): one (N, 512) one-hot x slab matmul
    and one MLP pass.  The ordered front-to-back composite rides the
    same layout: reshape (N, 1) -> (S, 64) is free, so the within-ray
    exclusive tau cumsum and the per-ray reduction are ~S VPU adds.
    The batched layout replaced an unrolled S-iteration loop of (64, .)
    ops whose VPU cost dominated the matmuls (measured 0.92 FPS at
    800^2, bf16 == fp8 timing -> compute-bound).
    """
    t = pl.program_id(0)
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    rays = rays_ref[:]                      # (64, 8): o3 du3 t1 t2
    o = rays[:, 0:3]
    du = rays[:, 3:6]
    t1 = rays[:, 6:7]                       # (64, 1)
    t2 = rays[:, 7:8]
    valid = vld_ref[t * Lp + l] > 0

    # exact slab test of the tile's rays against THIS brick
    m = meta_ref[0]                                    # (1, 8) brick row
    inv_d = 1.0 / jnp.where(jnp.abs(du) > 1e-10, du,
                            jnp.where(du >= 0, 1e-10, -1e-10))
    t_lo = (m[0:1, 0:3] - o) * inv_d                   # (64, 3)
    t_hi = (m[0:1, 3:6] - o) * inv_d
    ta = jnp.max(jnp.minimum(t_lo, t_hi), axis=1, keepdims=True)
    tb = jnp.min(jnp.maximum(t_lo, t_hi), axis=1, keepdims=True)
    ta = jnp.maximum(ta, t1)
    tb = jnp.minimum(tb, t2)
    n0 = jnp.maximum(jnp.ceil((ta - t1) / dt - 0.5), 0.0)   # (64, 1) f32
    n1 = jnp.floor((tb - t1) / dt - 0.5)
    hit = valid & (tb > ta) & (n1 >= n0) & (t2 > 0)         # (64, 1)

    tau_tot = out_ref[:, 0:1]                               # (64, 1)
    live = tau_tot < tau_max
    work = jnp.any(hit & live)

    @pl.when(work)
    def _body():
        N = S * TPX
        slab = slab_ref[0].astype(jnp.bfloat16)             # (512, 128)
        # corner-weight group reduce: (128, 16) constant, R[d*16+f, f]=1
        r_row = jax.lax.broadcasted_iota(jnp.int32, (ROWW, FEAT), 0)
        r_col = jax.lax.broadcasted_iota(jnp.int32, (ROWW, FEAT), 1)
        red = (r_row % FEAT == r_col).astype(jnp.bfloat16)

        # s-major sample domain: row j = s*64 + r (a (S, 64, C) -> (N, C)
        # leading-dim merge keeps the 64-sublane layout intact)
        def up(x):
            return jnp.broadcast_to(x[None], (S,) + x.shape) \
                .reshape(N, x.shape[1])

        # iota must be integer-typed on Mosaic; cast after
        s_n = jax.lax.broadcasted_iota(
            jnp.int32, (S, TPX, 1), 0).reshape(N, 1).astype(jnp.float32)
        n_s = up(n0) + s_n
        s_ok = up(hit) & (n_s <= up(n1))                    # (N, 1)
        ts = up(t1) + (n_s + 0.5) * dt
        xyz = up(o) + ts * up(du)                           # (N, 3)
        pos = jnp.clip(xyz * inv2s + 0.5, 0.0, 1.0 - 1e-6) * V
        v0 = jnp.floor(pos)
        frac = pos - v0
        loc = jnp.clip(v0 - jnp.floor(v0 * 0.125) * 8.0, 0.0, 7.0)
        lid = ((loc[:, 0:1] * 8.0 + loc[:, 1:2]) * 8.0
               + loc[:, 2:3]).astype(jnp.int32)             # (N, 1)
        colv = jax.lax.broadcasted_iota(jnp.int32, (N, VOX), 1)
        onehot = jnp.where(s_ok & (colv == lid), 1.0, 0.0) \
            .astype(jnp.bfloat16)
        out8 = jnp.dot(onehot, slab,
                       preferred_element_type=jnp.float32)  # (N, 128)
        # trilinear corner weights per pool lane: rows are corner-major
        # (lane = corner*FEAT + feat, models/baked.py bake/trilerp_w8,
        # x = LSB)
        clane = jax.lax.broadcasted_iota(jnp.int32, (N, ROWW), 1) // FEAT
        w128 = jnp.ones((N, ROWW), jnp.float32)
        for k in range(3):
            fk = frac[:, k:k + 1]
            w128 = w128 * jnp.where((clane >> k) & 1 == 1, fk, 1.0 - fk)
        h = jnp.dot((out8 * w128).astype(jnp.bfloat16), red,
                    preferred_element_type=jnp.float32)     # (N, 16)
        sd = jnp.where(s_ok,
                       jnp.exp(jnp.minimum(h[:, 0:1], 30.0)) * dt, 0.0)
        sd = jnp.minimum(sd, 80.0)                          # (N, 1)
        # rgb MLP on the whole window batch (bias-free, models/mlp.py)
        a = jnp.concatenate([up(sh_ref[:]), h], axis=1).astype(jnp.bfloat16)
        a = jnp.maximum(jnp.dot(a, w1_ref[:].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32),
                        0.0).astype(jnp.bfloat16)
        a = jnp.maximum(jnp.dot(a, w2_ref[:].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32),
                        0.0).astype(jnp.bfloat16)
        rgb_s = jax.nn.sigmoid(
            jnp.dot(a, w3_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32))    # (N, 3)

        # ordered composite: the s-major layout makes the within-ray
        # exclusive tau cumsum a (S, 64) axis-0 cumsum and the per-ray
        # reduction an axis-0 sum — leading-dim reshapes are free on the
        # (N, .) sublane layout, and both ops are ~S VPU adds (an earlier
        # (N, N) lmat matvec spent as many MXU passes as the one-hot
        # gather itself at 1/128 lane utility)
        # Mosaic has no cumsum lowering — S is tiny, unroll the exclusive
        # prefix as S chained adds on (1, 64) rows
        sd_s = sd.reshape(S, TPX)
        rows = [jnp.zeros((1, TPX), jnp.float32)]
        for si in range(S - 1):
            rows.append(rows[-1] + sd_s[si:si + 1])
        cum_excl = jnp.concatenate(rows, axis=0).reshape(N, 1)
        w = jnp.exp(-cum_excl) * (1.0 - jnp.exp(-sd))
        payload = jnp.concatenate([sd, w * rgb_s, w * ts], axis=1)
        acc = jnp.sum(payload.reshape(S, TPX, 5), axis=0)   # (64, 5)
        tau_c = acc[:, 0:1]
        rgbw = acc[:, 1:4]
        depw = acc[:, 4:5]

        # pair contribution behind the ray's carried transmittance
        T_bef = jnp.where(live, jnp.exp(-tau_tot), 0.0)
        upd = jnp.concatenate([
            jnp.where(live, tau_c, 0.0),                # tau
            T_bef * rgbw,                               # rgb
            T_bef * depw,                               # depth
            (hit & live).astype(jnp.float32),           # pairs rendered
            jnp.zeros((TPX, 2), jnp.float32)], axis=1)
        out_ref[:] = out_ref[:] + upd


@functools.partial(jax.jit, static_argnames=(
    "S", "dt", "inv2s", "V", "tau_max", "interpret"))
def brick_field_tiles(pool_blk, vld, meta, rays, sh, pool3, w1, w2, w3, *,
                      S: int, dt: float, inv2s: float, V: int,
                      tau_max: float, interpret: bool = False):
    """Composite T tiles' rays through their brick lists on the MXU.

    pool_blk: (T*Lp,) int32 pool-block DMA index (invalid slots sanitized
        to any in-range value by the caller).
    vld:      (T*Lp,) int32 1 = real brick, 0 = pad slot.
    meta:     (T*Lp, 8) f32 [brick lo xyz, hi xyz, pad, pad].
    rays:     (T*64, 8) f32 [o xyz, unit d xyz, t1, t2].
    sh:       (T*64, 16) f32 SH4 dir features (models/encoders).
    pool3:    (n_blocks, 512, 128) baked pool (any float dtype).
    w1/w2/w3: rgb MLP weights (32,64)/(64,64)/(64,3).
    Returns (T*64, 8) f32 [tau, rgb*3, depth-weight, n_pairs, 0, 0].
    """
    TL = pool_blk.shape[0]
    T = rays.shape[0] // TPX
    Lp = TL // T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, Lp),
        in_specs=[
            # meta rides as (TL, 1, 8): the TPU block rule needs the last
            # two block dims divisible by (8, 128) OR equal to the array
            # dims — (1, 8) on a (TL, 8) array violates the second-minor
            pl.BlockSpec((1, 1, 8),
                         lambda t, l, pb, vl: (t * Lp + l, 0, 0)),
            pl.BlockSpec((TPX, 8), lambda t, l, pb, vl: (t, 0)),
            pl.BlockSpec((TPX, 16), lambda t, l, pb, vl: (t, 0)),
            pl.BlockSpec((1, VOX, ROWW),
                         lambda t, l, pb, vl: (pb[t * Lp + l], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TPX, 8), lambda t, l, pb, vl: (t, 0)),
    )
    meta = meta.reshape(TL, 1, 8)
    kern = functools.partial(_kernel, Lp=Lp, S=S, dt=dt, inv2s=inv2s, V=V,
                             tau_max=tau_max)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * TPX, 8), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * Lp * S * TPX * (VOX * ROWW + 32 * 64 + 64 * 64
                                          + 64 * 3 + ROWW * FEAT),
            bytes_accessed=T * Lp * VOX * ROWW * pool3.dtype.itemsize,
            transcendentals=T * Lp * S * TPX * 4),
    )(pool_blk, vld, meta, rays, sh, pool3, w1, w2, w3)


def brick_field_tiles_reference(pool_blk, vld, meta, rays, sh, pool3, w1,
                                w2, w3, *, S, dt, inv2s, V, tau_max):
    """Pure-numpy restatement of the kernel semantics (same l ordering,
    same early-termination rule) for golden tests."""
    pool_blk = np.asarray(pool_blk)
    vld = np.asarray(vld)
    meta = np.asarray(meta, np.float32)
    rays = np.asarray(rays, np.float32)
    sh = np.asarray(sh, np.float32)
    pool3 = np.asarray(pool3, np.float32)
    w1, w2, w3 = (np.asarray(w, np.float32) for w in (w1, w2, w3))
    T = rays.shape[0] // TPX
    Lp = pool_blk.shape[0] // T
    out = np.zeros((T * TPX, 8), np.float32)
    for t in range(T):
        sl = slice(t * TPX, (t + 1) * TPX)
        o, du = rays[sl, 0:3], rays[sl, 3:6]
        t1, t2 = rays[sl, 6], rays[sl, 7]
        for l in range(Lp):
            if vld[t * Lp + l] <= 0:
                continue
            m = meta[t * Lp + l]
            inv_d = 1.0 / np.where(np.abs(du) > 1e-10, du,
                                   np.where(du >= 0, 1e-10, -1e-10))
            t_lo = (m[0:3][None] - o) * inv_d
            t_hi = (m[3:6][None] - o) * inv_d
            ta = np.maximum(np.minimum(t_lo, t_hi).max(1), t1)
            tb = np.minimum(np.maximum(t_lo, t_hi).min(1), t2)
            n0 = np.maximum(np.ceil((ta - t1) / dt - 0.5), 0.0)
            n1 = np.floor((tb - t1) / dt - 0.5)
            hit = (tb > ta) & (n1 >= n0) & (t2 > 0)
            tau_tot = out[sl, 0]
            live = tau_tot < tau_max
            if not np.any(hit & live):
                continue
            slab = pool3[pool_blk[t * Lp + l]]             # (512, 128)
            tau_c = np.zeros(TPX)
            rgbw = np.zeros((TPX, 3))
            depw = np.zeros(TPX)
            for s in range(S):
                n_s = n0 + s
                s_ok = hit & (n_s <= n1)
                ts = t1 + (n_s + 0.5) * dt
                xyz = o + ts[:, None] * du
                pos = np.clip(xyz * inv2s + 0.5, 0.0, 1.0 - 1e-6) * V
                v0 = np.floor(pos)
                frac = pos - v0
                loc = np.clip(v0 - np.floor(v0 * 0.125) * 8.0, 0.0, 7.0)
                lid = ((loc[:, 0] * 8 + loc[:, 1]) * 8
                       + loc[:, 2]).astype(np.int64)
                rows = slab[lid].reshape(TPX, 8, FEAT)
                w8 = np.ones((TPX, 8))
                for k in range(3):
                    bit = (np.arange(8)[None] >> k) & 1
                    w8 = w8 * np.where(bit == 1, frac[:, k:k + 1],
                                       1.0 - frac[:, k:k + 1])
                h = np.einsum("nc,ncf->nf", w8, rows)
                sd = np.where(s_ok,
                              np.exp(np.minimum(h[:, 0], 30.0)) * dt, 0.0)
                sd = np.minimum(sd, 80.0)
                a = np.maximum(np.concatenate([sh[sl], h], 1) @ w1, 0.0)
                a = np.maximum(a @ w2, 0.0)
                rgb_s = 1.0 / (1.0 + np.exp(-(a @ w3)))
                w = np.exp(-tau_c) * (1.0 - np.exp(-sd))
                rgbw += w[:, None] * rgb_s
                depw += w * ts
                tau_c += sd
            T_bef = np.where(live, np.exp(-tau_tot), 0.0)
            out[sl, 0] += np.where(live, tau_c, 0.0)
            out[sl, 1:4] += T_bef[:, None] * rgbw
            out[sl, 4] += T_bef * depw
            out[sl, 5] += (hit & live).astype(np.float32)
    return out


def window_span(max_samples: int, block: int, voxel_res: int,
                scale: float) -> int:
    """Longest lattice window inside one brick (matches
    models/render_brick.render_brick's S rule)."""
    s = min(0.5, scale)
    vox_w = 2.0 * s / voxel_res
    dt = math.sqrt(3.0) / max_samples
    return int(math.ceil(block * vox_w * math.sqrt(3.0) / dt)) + 1
