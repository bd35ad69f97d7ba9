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

Round 5: trilerp coordinates are BRICK-LOCAL — each (tile, slot) step
maps its samples onto the slab's own Bk^3 lattice over the meta AABB
[lo, hi], so bricks of different world sizes (mixed-resolution bakes,
models/baked_mixed.py) composite through one kernel.  The `inv2s`/`V`
static args only describe the uniform case for cost estimation and are
no longer read by the lattice math.
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
VOX = 512         # pool rows per brick at the DEFAULT block=8 (Bk^3)
ROWW = 128        # pool row lanes (8 corners x 16 features)
FEAT = 16


def _kernel(pb_ref, lb_ref, ns_ref, tid_ref, meta_ref, rays_ref, sh_ref,
            slab_ref, w1_ref, w2_ref, w3_ref, out_ref, *, S: int,
            dt: float, inv2s: float, V: int, tau_max: float,
            Bk: int = 8):
    """One (tile t, list slot l) grid step; out block revisited across l.

    List addressing is fully scalar-steered: tile t's slot l lives at row
    `lb[t] + l` of the pairs tables (pool_blk / meta) and is real iff
    `l < ns[t]` — so ONE kernel serves the banded main pass (lb = tid*Lp)
    AND the exact overflow-drain pass over a COMPACT extended table
    (lb = j*Lsel), models/render_brick_mxu.py.

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
    valid = l < ns_ref[t]

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
        vox = Bk * Bk * Bk
        slab = slab_ref[0].astype(jnp.bfloat16)             # (vox, 128)
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
        # BRICK-LOCAL voxel coords from the meta AABB: the brick's slab
        # is its own Bk^3 lattice over [lo, hi], so bricks of ANY world
        # size (mixed-resolution bakes, models/baked_mixed.py) render
        # through one kernel.  For uniform bakes this equals the old
        # global-V arithmetic.
        fBk = float(Bk)
        u = (xyz - m[0:1, 0:3]) * (fBk / (m[0:1, 3:6] - m[0:1, 0:3]))
        u = jnp.clip(u, 0.0, fBk - 1e-3)
        v0 = jnp.floor(u)
        frac = u - v0
        lid = ((v0[:, 0:1] * fBk + v0[:, 1:2]) * fBk
               + v0[:, 2:3]).astype(jnp.int32)              # (N, 1)
        colv = jax.lax.broadcasted_iota(jnp.int32, (N, vox), 1)
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
        # rgb MLP on the whole window batch (bias-free, models/mlp.py).
        # The [sh ++ h] input concat is expressed as a SPLIT matmul
        # (w1 row slices) — Mosaic rejects tpu.concatenate of operands
        # whose vreg layouts carry different offsets (chip probe r3).
        w1b = w1_ref[:].astype(jnp.bfloat16)                # (32, 64)
        a = jnp.maximum(
            jnp.dot(up(sh_ref[:]).astype(jnp.bfloat16), w1b[0:FEAT],
                    preferred_element_type=jnp.float32)
            + jnp.dot(h.astype(jnp.bfloat16), w1b[FEAT:],
                      preferred_element_type=jnp.float32),
            0.0).astype(jnp.bfloat16)
        a = jnp.maximum(jnp.dot(a, w2_ref[:].astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32),
                        0.0).astype(jnp.bfloat16)
        rgb_s = jax.nn.sigmoid(
            jnp.dot(a, w3_ref[:].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32))    # (N, 3)

        # ordered composite, running-accumulator form: slice si of the
        # s-major (N, .) layout is 64 SUBLANE rows = sample s=si of all
        # rays.  A register prefix (exp(-run)) walks the S slices; no
        # materialized (N, 1) exclusive-cumsum vector exists, so there
        # is NO tpu.concatenate of accumulated registers (Mosaic rejects
        # mixed-offset concats: "result/input offset mismatch", chip
        # probe r3) and no cumsum lowering is needed.
        run = jnp.zeros((TPX, 1), jnp.float32)
        rgbw = jnp.zeros((TPX, 3), jnp.float32)
        depw = jnp.zeros((TPX, 1), jnp.float32)
        for si in range(S):
            sl = slice(si * TPX, (si + 1) * TPX)
            sd_si = sd[sl]                                  # (64, 1)
            w_si = jnp.exp(-run) * (1.0 - jnp.exp(-sd_si))
            rgbw = rgbw + w_si * rgb_s[sl]
            depw = depw + w_si * ts[sl]
            run = run + sd_si
        tau_c = run

        # pair contribution behind the ray's carried transmittance;
        # column-slice accumulate (no (64, 8) upd concat)
        T_bef = jnp.where(live, jnp.exp(-tau_tot), 0.0)
        out_ref[:, 0:1] += jnp.where(live, tau_c, 0.0)
        out_ref[:, 1:4] += T_bef * rgbw
        out_ref[:, 4:5] += T_bef * depw
        out_ref[:, 5:6] += (hit & live).astype(jnp.float32)


def _list_scalars(pool_blk, rays, tid, lbase, nslots, Lcall):
    """Normalize the scalar-steering triplet (tid, lbase, nslots).

    Default = dense main pass: every tile rendered, lb = tid * Lp,
    nslots = Lp (caller-provided nslots overrides for depth-sorted lists
    with pad suffixes or band capacity cuts)."""
    T = rays.shape[0] // TPX
    Lp = pool_blk.shape[0] // T
    if tid is None:
        tid = jnp.arange(T, dtype=jnp.int32)
    if lbase is None:
        lbase = tid.astype(jnp.int32) * Lp
    if nslots is None:
        nslots = jnp.full(tid.shape, Lp, jnp.int32)
    if not Lcall:
        Lcall = Lp
    return (tid.astype(jnp.int32), lbase.astype(jnp.int32),
            nslots.astype(jnp.int32), Lcall)


@functools.partial(jax.jit, static_argnames=(
    "S", "dt", "inv2s", "V", "tau_max", "Lcall", "Bk", "interpret"))
def brick_field_tiles(pool_blk, meta, rays, sh, pool3, w1, w2, w3, *,
                      S: int, dt: float, inv2s: float, V: int,
                      tau_max: float, tid=None, lbase=None, nslots=None,
                      Lcall: int = 0, Bk: int = 8, interpret: bool = False):
    """Composite T tiles' rays through their brick lists on the MXU.

    pool_blk: (n_rows,) int32 pool-block DMA index per list row (invalid
        rows sanitized to any in-range value by the caller).
    meta:     (n_rows, 8) f32 [brick lo xyz, hi xyz, pad, pad].
    rays:     (T*64, 8) f32 [o xyz, unit d xyz, t1, t2].
    sh:       (T*64, 16) f32 SH4 dir features (models/encoders).
    pool3:    (n_blocks, 512, 128) baked pool (any float dtype).
    w1/w2/w3: rgb MLP weights (32,64)/(64,64)/(64,3).
    tid:      optional (Tb,) int32 tile ids to render — all ray/output
        arrays stay full-size and UNSORTED; the scalar-prefetched ids
        steer the DMA index maps, and each tile's output lands at its own
        block (unlisted tiles' blocks are UNDEFINED).
    lbase:    optional (Tb,) int32 first list row of each rendered tile
        (default tid * Lp).  A COMPACT side table (e.g. the overflow
        drain's (D, Lsel) extended lists) just passes its own bases.
    nslots:   optional (Tb,) int32 real slots per rendered tile; slots
        l >= nslots[t] are pads (lists are depth-sorted, pads last — a
        capacity cut drops the FARTHEST bricks).
    Lcall:    list slots rendered this call (grid dim; 0 = Lp).
    Returns (T*64, 8) f32 [tau, rgb*3, depth-weight, n_pairs, 0, 0].
    """
    T = rays.shape[0] // TPX
    tid, lbase, nslots, Lcall = _list_scalars(pool_blk, rays, tid, lbase,
                                              nslots, Lcall)
    Tb = tid.shape[0]
    vox = Bk * Bk * Bk
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Tb, Lcall),
        in_specs=[
            # meta rides as (n_rows, 1, 8): the TPU block rule needs the
            # last two block dims divisible by (8, 128) OR equal to the
            # array dims — (1, 8) on a (n_rows, 8) array violates the
            # second-minor
            pl.BlockSpec((1, 1, 8),
                         lambda t, l, pb, lb, ns, td: (lb[t] + l, 0, 0)),
            pl.BlockSpec((TPX, 8), lambda t, l, pb, lb, ns, td:
                         (td[t], 0)),
            pl.BlockSpec((TPX, 16), lambda t, l, pb, lb, ns, td:
                         (td[t], 0)),
            pl.BlockSpec((1, vox, ROWW),
                         lambda t, l, pb, lb, ns, td:
                         (pb[lb[t] + l], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TPX, 8), lambda t, l, pb, lb, ns, td:
                               (td[t], 0)),
    )
    meta = meta.reshape(-1, 1, 8)
    kern = functools.partial(_kernel, S=S, dt=dt, inv2s=inv2s, V=V,
                             tau_max=tau_max, Bk=Bk)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * TPX, 8), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Tb * Lcall * S * TPX * (vox * ROWW + 32 * 64
                                              + 64 * 64 + 64 * 3
                                              + ROWW * FEAT),
            bytes_accessed=Tb * Lcall * vox * ROWW * pool3.dtype.itemsize,
            transcendentals=Tb * Lcall * S * TPX * 4),
    )(pool_blk, lbase, nslots, tid, meta, rays, sh, pool3, w1, w2, w3)


def _kernel_t(pb_ref, lb_ref, ns_ref, tid_ref, metaT_ref, raysT_ref,
              shT_ref, slabT_ref, rowv_ref, bitw_ref, w1t_ref, w2t_ref,
              w3t_ref, outT_ref, *, S: int, dt: float, inv2s: float,
              V: int, tau_max: float, Bk: int = 8):
    """Transposed-layout variant: RAYS ON LANES.

    The n-major kernel's per-sample scalar chains ((N, 1) and (N, 3)
    arrays) occupy 1-3 lanes of 128 per vreg — ~72 mostly-empty vregs
    per op.  Here every per-ray quantity is a (1, 64) lane row, the
    window chain is (1, N) built s-major with 64-aligned lane
    concats/slices (no cross-tiling reshapes), and the one-hot gather,
    corner-weight reduce, and MLP all run transposed: the pool slab is
    pre-transposed at bake wrap time to (128, 512) so out8 = slabT @
    onehotT.  Same semantics as _kernel (golden-locked against
    brick_field_tiles_reference).
    """
    t = pl.program_id(0)
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _init():
        outT_ref[:] = jnp.zeros_like(outT_ref)

    rays = raysT_ref[:]                     # (8, 64): rows o3 du3 t1 t2
    o = rays[0:3]
    du = rays[3:6]
    t1 = rays[6:7]                          # (1, 64)
    t2 = rays[7:8]
    valid = l < ns_ref[t]
    m = metaT_ref[0]                        # (1, 8) brick row

    inv_d = 1.0 / jnp.where(jnp.abs(du) > 1e-10, du,
                            jnp.where(du >= 0, 1e-10, -1e-10))
    # slab test per axis with (1, 1) bound splats against (1, 64) rows
    ta, tb = t1, t2
    for k in range(3):
        a = (m[0:1, k:k + 1] - o[k:k + 1]) * inv_d[k:k + 1]
        b = (m[0:1, k + 3:k + 4] - o[k:k + 1]) * inv_d[k:k + 1]
        ta = jnp.maximum(ta, jnp.minimum(a, b))
        tb = jnp.minimum(tb, jnp.maximum(a, b))
    n0 = jnp.maximum(jnp.ceil((ta - t1) / dt - 0.5), 0.0)   # (1, 64)
    n1 = jnp.floor((tb - t1) / dt - 0.5)
    hit = valid & (tb > ta) & (n1 >= n0) & (t2 > 0)         # (1, 64)

    tau_tot = outT_ref[0:1, :]                              # (1, 64)
    live = tau_tot < tau_max
    work = jnp.any(hit & live)

    @pl.when(work)
    def _body():
        N = S * TPX
        slabT = slabT_ref[0].astype(jnp.bfloat16)           # (128, vox)

        def lane_tile(x):                   # (1or k, 64) -> (., N) s-major
            return jnp.concatenate([x] * S, axis=1)

        s_n = (jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
               // TPX).astype(jnp.float32)                  # (1, N)
        n_s = lane_tile(n0) + s_n
        # bool vectors cannot lane-concat ("invalid vector register
        # cast", tools/mosaic_bisect.py k14) — tile hit as f32
        hitf = jnp.where(hit, 1.0, 0.0)
        ok_n = (lane_tile(hitf) > 0.5) & (n_s <= lane_tile(n1))
        ts = lane_tile(t1) + (n_s + 0.5) * dt
        o_n = lane_tile(o)                                  # (3, N)
        du_n = lane_tile(du)
        # brick-local voxel coords from the meta AABB (see _kernel):
        # mixed-resolution bricks render through the same lattice math
        fBk = float(Bk)
        lid = jnp.zeros((1, N), jnp.float32)
        frs = []
        for k in range(3):
            u = (o_n[k:k + 1] + ts * du_n[k:k + 1] - m[0:1, k:k + 1]) \
                * (fBk / (m[0:1, k + 3:k + 4] - m[0:1, k:k + 1]))
            u = jnp.clip(u, 0.0, fBk - 1e-3)
            v0 = jnp.floor(u)
            frs.append(u - v0)
            lid = lid * fBk + v0
        lid_i = lid.astype(jnp.int32)                       # (1, N)

        # rowv is a PRECOMPUTED (VOX, N) int32 row-index table (the same
        # for every grid step — in-kernel iota re-built it each step).
        # i16 compares are unsupported, and selecting bf16 straight off
        # an i32-derived mask needs an invalid (8,128)->(16,128) mask
        # relayout — select f32, convert after (both chip-bisected,
        # tools/mosaic_bisect.py).
        ohT = jnp.where(ok_n & (rowv_ref[:] == lid_i),
                        1.0, 0.0).astype(jnp.bfloat16)      # (512, N)
        out8T = jnp.dot(slabT, ohT,
                        preferred_element_type=jnp.float32)  # (128, N)

        # trilinear corner weights from precomputed f32 bit masks:
        # w_k = (1 - f_k) + bit_k * (2 f_k - 1) — pure mul/add, no
        # per-step iota/shift/compare chains
        w128T = jnp.ones((ROWW, N), jnp.float32)
        for k in range(3):
            w128T = w128T * ((1.0 - frs[k])
                             + bitw_ref[k] * (2.0 * frs[k] - 1.0))
        rr = jax.lax.broadcasted_iota(jnp.int32, (FEAT, ROWW), 0)
        rc = jax.lax.broadcasted_iota(jnp.int32, (FEAT, ROWW), 1)
        redT = (rc % FEAT == rr).astype(jnp.float32) \
            .astype(jnp.bfloat16)                           # (16, 128)
        hT = jnp.dot(redT, (out8T * w128T).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)    # (16, N)

        sd = jnp.where(ok_n,
                       jnp.exp(jnp.minimum(hT[0:1], 30.0)) * dt, 0.0)
        sd = jnp.minimum(sd, 80.0)                          # (1, N)

        # MLP input [sh ++ h] as a SPLIT matmul over w1t column slices —
        # Mosaic rejects tpu.concatenate of mixed-offset operands (chip
        # probe r3)
        sh_n = lane_tile(shT_ref[:])                        # (16, N)
        w1b = w1t_ref[:].astype(jnp.bfloat16)               # (64, 32)
        a = jnp.maximum(
            jnp.dot(w1b[:, 0:FEAT], sh_n.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
            + jnp.dot(w1b[:, FEAT:], hT.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32),
            0.0).astype(jnp.bfloat16)                       # (64, N)
        a = jnp.maximum(jnp.dot(w2t_ref[:].astype(jnp.bfloat16), a,
                                preferred_element_type=jnp.float32),
                        0.0).astype(jnp.bfloat16)
        rgbT = jax.nn.sigmoid(
            jnp.dot(w3t_ref[:].astype(jnp.bfloat16), a,
                    preferred_element_type=jnp.float32))    # (3, N)

        # ordered composite, running-accumulator form over 64-aligned
        # lane slices (s-slice si of a (1, N) row = lanes [si*64,
        # (si+1)*64)); the exclusive prefix lives in a (1, 64) register
        # walked across slices — no materialized cum_excl, no
        # tpu.concatenate of accumulated registers (Mosaic rejects
        # mixed-offset concats, chip probe r3)
        run = jnp.zeros((1, TPX), jnp.float32)
        rgbw = jnp.zeros((3, TPX), jnp.float32)
        depw = jnp.zeros((1, TPX), jnp.float32)
        for si in range(S):
            sl = slice(si * TPX, (si + 1) * TPX)
            sd_si = sd[:, sl]                               # (1, 64)
            w_si = jnp.exp(-run) * (1.0 - jnp.exp(-sd_si))
            rgbw = rgbw + w_si * rgbT[:, sl]
            depw = depw + w_si * ts[:, sl]
            run = run + sd_si
        tau_c = run

        # row-slice accumulate into the revisited block (no upd concat)
        T_bef = jnp.where(live, jnp.exp(-tau_tot), 0.0)     # (1, 64)
        outT_ref[0:1, :] += jnp.where(live, tau_c, 0.0)
        outT_ref[1:4, :] += T_bef * rgbw
        outT_ref[4:5, :] += T_bef * depw
        outT_ref[5:6, :] += (hit & live).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "S", "dt", "inv2s", "V", "tau_max", "Lcall", "Bk", "interpret"))
def brick_field_tiles_t(pool_blk, meta, rays, sh, pool3T, w1, w2, w3,
                        *, S: int, dt: float, inv2s: float, V: int,
                        tau_max: float, tid=None, lbase=None, nslots=None,
                        Lcall: int = 0, Bk: int = 8,
                        interpret: bool = False):
    """Transposed-layout entry: same contract as brick_field_tiles but
    pool3T is the PRE-TRANSPOSED pool (n_blocks, 128, 512); rays/sh/meta
    /weights are transposed on the fly (tiny XLA ops outside the
    kernel), and the (T*64, 8) output is restored to the n-major
    contract so callers are layout-agnostic.  tid/lbase/nslots/Lcall as
    in brick_field_tiles (band scheduling + compact drain tables)."""
    T = rays.shape[0] // TPX
    tid, lbase, nslots, Lcall = _list_scalars(pool_blk, rays, tid, lbase,
                                              nslots, Lcall)
    Tb = tid.shape[0]
    # (T*64, 8) -> (T*8, 64) tile-blocked transpose; same for sh
    raysT = rays.reshape(T, TPX, 8).swapaxes(1, 2).reshape(T * 8, TPX)
    shT = sh.reshape(T, TPX, FEAT).swapaxes(1, 2).reshape(T * FEAT, TPX)
    metaT = meta.reshape(-1, 1, 8)
    N = S * TPX
    vox = Bk * Bk * Bk
    # loop-invariant lookup tables (see _kernel_t): voxel-row index and
    # corner-bit masks — built here once, resident in VMEM for every step
    rowv = jax.lax.broadcasted_iota(jnp.int32, (vox, N), 0)
    bitw = jnp.stack([jnp.broadcast_to(
        ((jnp.arange(ROWW, dtype=jnp.int32)[:, None] // FEAT >> k) & 1
         ).astype(jnp.float32), (ROWW, N)) for k in range(3)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Tb, Lcall),
        in_specs=[
            pl.BlockSpec((1, 1, 8),
                         lambda t, l, pb, lb, ns, td: (lb[t] + l, 0, 0)),
            pl.BlockSpec((8, TPX), lambda t, l, pb, lb, ns, td:
                         (td[t], 0)),
            pl.BlockSpec((FEAT, TPX), lambda t, l, pb, lb, ns, td:
                         (td[t], 0)),
            pl.BlockSpec((1, ROWW, vox),
                         lambda t, l, pb, lb, ns, td:
                         (pb[lb[t] + l], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TPX), lambda t, l, pb, lb, ns, td:
                               (td[t], 0)),
    )
    kern = functools.partial(_kernel_t, S=S, dt=dt, inv2s=inv2s,
                             V=V, tau_max=tau_max, Bk=Bk)
    outT = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * 8, TPX), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Tb * Lcall * S * TPX * (vox * ROWW + 32 * 64
                                              + 64 * 64 + 64 * 3
                                              + ROWW * FEAT),
            bytes_accessed=Tb * Lcall * vox * ROWW * pool3T.dtype.itemsize,
            transcendentals=Tb * Lcall * S * TPX * 4),
    )(pool_blk, lbase, nslots, tid, metaT, raysT, shT, pool3T, rowv, bitw,
      w1.T, w2.T, w3.T)
    return outT.reshape(T, 8, TPX).swapaxes(1, 2).reshape(T * TPX, 8)


def _kernel_tp(pb_ref, lb_ref, ns_ref, tid_ref, metaP_ref, raysT_ref,
               shT_ref, initT_ref, *slab_w_out, S: int, dt: float,
               inv2s: float, V: int, tau_max: float, P: int, Bk: int = 8):
    """P-slot batched transposed kernel: one grid step renders P
    consecutive list slots (P slab DMAs, P sub-brick bodies chained
    through a REGISTER tau carry).  Semantics are identical to _kernel_t
    stepping the same slots sequentially: each sub-brick recomputes
    per-ray liveness from the carried tau, so early termination keeps
    brick granularity; the group is skipped only when NO sub-brick has a
    live hit (exactly the case where every sequential step would skip).
    Amortizes the per-step grid sequencing + block-fetch overhead by P —
    the measured wall once the body went batched (R2.2)."""
    slab_refs = slab_w_out[:P]
    rowv_ref, bitw_ref, w1t_ref, w2t_ref, w3t_ref, outT_ref = slab_w_out[P:]
    t = pl.program_id(0)
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _init():
        # carry-in: the segmented renderer resumes a tile's composite
        # mid-list by passing the previous segment's accumulator; the
        # plain path passes zeros (same semantics as before)
        outT_ref[:] = initT_ref[:]

    rays = raysT_ref[:]                     # (8, 64)
    o = rays[0:3]
    du = rays[3:6]
    t1 = rays[6:7]
    t2 = rays[7:8]
    inv_d = 1.0 / jnp.where(jnp.abs(du) > 1e-10, du,
                            jnp.where(du >= 0, 1e-10, -1e-10))
    N = S * TPX

    def lane_tile(x):
        return jnp.concatenate([x] * S, axis=1)

    # slab tests for all P sub-bricks (cheap VPU; gates the group skip)
    hits, n0s, n1s = [], [], []
    for k in range(P):
        valid = l * P + k < ns_ref[t]
        m = metaP_ref[k]                    # (1, 8)
        ta, tb = t1, t2
        for kk in range(3):
            a = (m[0:1, kk:kk + 1] - o[kk:kk + 1]) * inv_d[kk:kk + 1]
            b = (m[0:1, kk + 3:kk + 4] - o[kk:kk + 1]) * inv_d[kk:kk + 1]
            ta = jnp.maximum(ta, jnp.minimum(a, b))
            tb = jnp.minimum(tb, jnp.maximum(a, b))
        n0 = jnp.maximum(jnp.ceil((ta - t1) / dt - 0.5), 0.0)
        n1 = jnp.floor((tb - t1) / dt - 0.5)
        hits.append(valid & (tb > ta) & (n1 >= n0) & (t2 > 0))
        n0s.append(n0)
        n1s.append(n1)
    hit_any = hits[0]
    for k in range(1, P):
        hit_any = hit_any | hits[k]

    tau_in = outT_ref[0:1, :]                               # (1, 64)
    work = jnp.any(hit_any & (tau_in < tau_max))

    @pl.when(work)
    def _body():
        o_n = lane_tile(o)
        du_n = lane_tile(du)
        t1_n = lane_tile(t1)
        s_n = (jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
               // TPX).astype(jnp.float32)
        sh_n = lane_tile(shT_ref[:])                        # (16, N)

        tau_tot = tau_in
        upd_tau = jnp.zeros((1, TPX), jnp.float32)
        upd_rgb = jnp.zeros((3, TPX), jnp.float32)
        upd_dep = jnp.zeros((1, TPX), jnp.float32)
        upd_cnt = jnp.zeros((1, TPX), jnp.float32)
        for k in range(P):
            live = tau_tot < tau_max
            hit = hits[k]
            slabT = slab_refs[k][0].astype(jnp.bfloat16)    # (128, 512)
            n_s = lane_tile(n0s[k]) + s_n
            hitf = jnp.where(hit, 1.0, 0.0)
            ok_n = (lane_tile(hitf) > 0.5) & (n_s <= lane_tile(n1s[k]))
            ts = t1_n + (n_s + 0.5) * dt
            # brick-local voxel coords from THIS sub-brick's meta AABB
            # (see _kernel): mixed-resolution bricks ride the same math
            m = metaP_ref[k]                                # (1, 8)
            fBk = float(Bk)
            lid = jnp.zeros((1, N), jnp.float32)
            frs = []
            for kk in range(3):
                u = (o_n[kk:kk + 1] + ts * du_n[kk:kk + 1]
                     - m[0:1, kk:kk + 1]) \
                    * (fBk / (m[0:1, kk + 3:kk + 4] - m[0:1, kk:kk + 1]))
                u = jnp.clip(u, 0.0, fBk - 1e-3)
                v0 = jnp.floor(u)
                frs.append(u - v0)
                lid = lid * fBk + v0
            lid_i = lid.astype(jnp.int32)
            ohT = jnp.where(ok_n & (rowv_ref[:] == lid_i),
                            1.0, 0.0).astype(jnp.bfloat16)
            out8T = jnp.dot(slabT, ohT,
                            preferred_element_type=jnp.float32)
            w128T = jnp.ones((ROWW, N), jnp.float32)
            for kk in range(3):
                w128T = w128T * ((1.0 - frs[kk])
                                 + bitw_ref[kk] * (2.0 * frs[kk] - 1.0))
            rr = jax.lax.broadcasted_iota(jnp.int32, (FEAT, ROWW), 0)
            rc = jax.lax.broadcasted_iota(jnp.int32, (FEAT, ROWW), 1)
            redT = (rc % FEAT == rr).astype(jnp.float32) \
                .astype(jnp.bfloat16)
            hT = jnp.dot(redT, (out8T * w128T).astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            sd = jnp.where(ok_n,
                           jnp.exp(jnp.minimum(hT[0:1], 30.0)) * dt, 0.0)
            sd = jnp.minimum(sd, 80.0)
            # split matmul for the [sh ++ h] MLP input; running-
            # accumulator composite — both because Mosaic rejects
            # tpu.concatenate of mixed-offset operands (chip probe r3,
            # see _kernel_t)
            w1b = w1t_ref[:].astype(jnp.bfloat16)
            a = jnp.maximum(
                jnp.dot(w1b[:, 0:FEAT], sh_n.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                + jnp.dot(w1b[:, FEAT:], hT.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32),
                0.0).astype(jnp.bfloat16)
            a = jnp.maximum(jnp.dot(w2t_ref[:].astype(jnp.bfloat16), a,
                                    preferred_element_type=jnp.float32),
                            0.0).astype(jnp.bfloat16)
            rgbT = jax.nn.sigmoid(
                jnp.dot(w3t_ref[:].astype(jnp.bfloat16), a,
                        preferred_element_type=jnp.float32))
            run = jnp.zeros((1, TPX), jnp.float32)
            rgbw = jnp.zeros((3, TPX), jnp.float32)
            depw = jnp.zeros((1, TPX), jnp.float32)
            for si in range(S):
                sl = slice(si * TPX, (si + 1) * TPX)
                sd_si = sd[:, sl]
                w_si = jnp.exp(-run) * (1.0 - jnp.exp(-sd_si))
                rgbw = rgbw + w_si * rgbT[:, sl]
                depw = depw + w_si * ts[:, sl]
                run = run + sd_si
            tau_c = run
            T_bef = jnp.where(live, jnp.exp(-tau_tot), 0.0)
            upd_tau = upd_tau + jnp.where(live, tau_c, 0.0)
            upd_rgb = upd_rgb + T_bef * rgbw
            upd_dep = upd_dep + T_bef * depw
            upd_cnt = upd_cnt + (hit & live).astype(jnp.float32)
            tau_tot = tau_tot + jnp.where(live, tau_c, 0.0)
        # row-slice accumulate (no (8, 64) upd concat)
        outT_ref[0:1, :] += upd_tau
        outT_ref[1:4, :] += upd_rgb
        outT_ref[4:5, :] += upd_dep
        outT_ref[5:6, :] += upd_cnt


@functools.partial(jax.jit, static_argnames=(
    "S", "dt", "inv2s", "V", "tau_max", "Lcall", "P", "Bk", "interpret"))
def brick_field_tiles_tp(pool_blk, meta, rays, sh, pool3T, w1, w2, w3,
                         *, S: int, dt: float, inv2s: float, V: int,
                         tau_max: float, tid=None, lbase=None, nslots=None,
                         Lcall: int = 0, P: int = 4, Bk: int = 8,
                         init=None, interpret: bool = False):
    """P-slot batched transposed entry: contract of brick_field_tiles_t,
    plus the requirement that Lcall and every lbase are multiples of P
    (the meta BlockSpec reads P consecutive list rows per step).

    init: optional (T*TPX, 8) accumulator carry-in (n-major, same layout
    as the return value).  A rendered tile RESUMES compositing from its
    init block — the segmented renderer passes the previous segment's
    output so early-terminated tiles can skip their remaining list slots
    across calls.  None = zeros (fresh frame)."""
    T = rays.shape[0] // TPX
    tid, lbase, nslots, Lcall = _list_scalars(pool_blk, rays, tid, lbase,
                                              nslots, Lcall)
    assert Lcall % P == 0, (Lcall, P)
    Tb = tid.shape[0]
    raysT = rays.reshape(T, TPX, 8).swapaxes(1, 2).reshape(T * 8, TPX)
    shT = sh.reshape(T, TPX, FEAT).swapaxes(1, 2).reshape(T * FEAT, TPX)
    if init is None:
        initT = jnp.zeros((T * 8, TPX), jnp.float32)
    else:
        initT = init.reshape(T, TPX, 8).swapaxes(1, 2).reshape(T * 8, TPX)
    metaP = meta.reshape(-1, 1, 8)
    N = S * TPX
    vox = Bk * Bk * Bk
    rowv = jax.lax.broadcasted_iota(jnp.int32, (vox, N), 0)
    bitw = jnp.stack([jnp.broadcast_to(
        ((jnp.arange(ROWW, dtype=jnp.int32)[:, None] // FEAT >> k) & 1
         ).astype(jnp.float32), (ROWW, N)) for k in range(3)])
    # CONTRACT: every lbase must be a multiple of P (the (P, 1, 8) meta
    # block read starts at lb//P).  No silent rounding — a misaligned
    # lbase would quietly render SHIFTED lists; let it surface as wrong
    # scores in tests instead (ADVICE r3; Lcall has the loud assert).
    slab_specs = [
        pl.BlockSpec((1, ROWW, vox),
                     functools.partial(
                         lambda t, l, pb, lb, ns, td, k=0:
                         (pb[lb[t] + l * P + k], 0, 0), k=k))
        for k in range(P)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Tb, Lcall // P),
        in_specs=[
            pl.BlockSpec((P, 1, 8),
                         lambda t, l, pb, lb, ns, td:
                         (lb[t] // P + l, 0, 0)),
            pl.BlockSpec((8, TPX), lambda t, l, pb, lb, ns, td:
                         (td[t], 0)),
            pl.BlockSpec((FEAT, TPX), lambda t, l, pb, lb, ns, td:
                         (td[t], 0)),
            pl.BlockSpec((8, TPX), lambda t, l, pb, lb, ns, td:
                         (td[t], 0)),
            *slab_specs,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TPX), lambda t, l, pb, lb, ns, td:
                               (td[t], 0)),
    )
    kern = functools.partial(_kernel_tp, S=S, dt=dt, inv2s=inv2s,
                             V=V, tau_max=tau_max, P=P, Bk=Bk)
    outT = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * 8, TPX), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Tb * Lcall * S * TPX * (vox * ROWW + 32 * 64
                                              + 64 * 64 + 64 * 3
                                              + ROWW * FEAT),
            bytes_accessed=Tb * Lcall * vox * ROWW * pool3T.dtype.itemsize,
            transcendentals=Tb * Lcall * S * TPX * 4),
    )(pool_blk, lbase, nslots, tid, metaP, raysT, shT, initT,
      *([pool3T] * P), rowv, bitw, w1.T, w2.T, w3.T)
    return outT.reshape(T, 8, TPX).swapaxes(1, 2).reshape(T * TPX, 8)


def _kernel_wl(wt_ref, wl_ref, wn_ref, wf_ref, ws_ref, metaP_ref,
               raysT_ref, shT_ref, initT_ref, *slab_w_out, S: int,
               dt: float, tau_max: float, P: int, Bk: int = 8):
    """WORKLIST-grid variant of _kernel_tp: grid step j renders one
    (tile, P-slot group) WORK ITEM from scalar-prefetched tables instead
    of a dense (tile, list-slot) grid.

    Why (round-5 trace, tools/profile_frame.py): the dense grid costs
    ~2.7 us per grid STEP whether or not the step has work — at 800^2
    the v256 champion sequences ~60k steps for ~51k real slots spread
    over tiles whose MEAN true-hit count is ~5 against a static capacity
    of 96, so most steps are dead padding.  The worklist grid sequences
    ONLY real groups (plus bounded padding): wt[j] = tile, wl[j] =
    first pairs-table row (P-aligned), wn[j] = live slots in the group
    (0 on pad steps), wf[j] = 1 iff this is the tile's first group in
    THIS call (initialize the revisited output block from init).

    Contract: steps of one tile are CONSECUTIVE (tile-major worklist) —
    the revisited output block stays in VMEM across its groups; pad
    steps repeat the last real tile id so no spurious block flush
    happens.  Output blocks of tiles absent from the worklist are
    UNDEFINED — the caller must mask them (models/render_brick_mxu.py
    does, against the segment carry).

    ws_ref holds the PER-STEP slab block ids ws[j*P + k] (gathered
    XLA-side from the pairs table): prefetching the whole frame's
    pool_blk table instead overflows SMEM at 800^2 (~3.9 MB of scalar
    operands) and crashes the Mosaic compile helper — the worklist-
    sized (Ns*P) table stays ~100-300 KB.
    """
    j = pl.program_id(0)
    slab_refs = slab_w_out[:P]
    rowv_ref, bitw_ref, w1t_ref, w2t_ref, w3t_ref, outT_ref = slab_w_out[P:]

    @pl.when(wf_ref[j] == 1)
    def _init():
        outT_ref[:] = initT_ref[:]
    rays = raysT_ref[:]                     # (8, 64)
    o = rays[0:3]
    du = rays[3:6]
    t1 = rays[6:7]
    t2 = rays[7:8]
    inv_d = 1.0 / jnp.where(jnp.abs(du) > 1e-10, du,
                            jnp.where(du >= 0, 1e-10, -1e-10))
    N = S * TPX

    def lane_tile(x):
        return jnp.concatenate([x] * S, axis=1)

    hits, n0s, n1s = [], [], []
    for k in range(P):
        valid = k < wn_ref[j]
        m = metaP_ref[k]                    # (1, 8)
        ta, tb = t1, t2
        for kk in range(3):
            a = (m[0:1, kk:kk + 1] - o[kk:kk + 1]) * inv_d[kk:kk + 1]
            b = (m[0:1, kk + 3:kk + 4] - o[kk:kk + 1]) * inv_d[kk:kk + 1]
            ta = jnp.maximum(ta, jnp.minimum(a, b))
            tb = jnp.minimum(tb, jnp.maximum(a, b))
        n0 = jnp.maximum(jnp.ceil((ta - t1) / dt - 0.5), 0.0)
        n1 = jnp.floor((tb - t1) / dt - 0.5)
        hits.append(valid & (tb > ta) & (n1 >= n0) & (t2 > 0))
        n0s.append(n0)
        n1s.append(n1)
    hit_any = hits[0]
    for k in range(1, P):
        hit_any = hit_any | hits[k]

    tau_in = outT_ref[0:1, :]                               # (1, 64)
    work = jnp.any(hit_any & (tau_in < tau_max))

    @pl.when(work)
    def _body():
        o_n = lane_tile(o)
        du_n = lane_tile(du)
        t1_n = lane_tile(t1)
        s_n = (jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
               // TPX).astype(jnp.float32)
        sh_n = lane_tile(shT_ref[:])                        # (16, N)

        tau_tot = tau_in
        upd_tau = jnp.zeros((1, TPX), jnp.float32)
        upd_rgb = jnp.zeros((3, TPX), jnp.float32)
        upd_dep = jnp.zeros((1, TPX), jnp.float32)
        upd_cnt = jnp.zeros((1, TPX), jnp.float32)
        for k in range(P):
            live = tau_tot < tau_max
            hit = hits[k]
            slabT = slab_refs[k][0].astype(jnp.bfloat16)    # (128, vox)
            n_s = lane_tile(n0s[k]) + s_n
            hitf = jnp.where(hit, 1.0, 0.0)
            ok_n = (lane_tile(hitf) > 0.5) & (n_s <= lane_tile(n1s[k]))
            ts = t1_n + (n_s + 0.5) * dt
            m = metaP_ref[k]                                # (1, 8)
            fBk = float(Bk)
            lid = jnp.zeros((1, N), jnp.float32)
            frs = []
            for kk in range(3):
                u = (o_n[kk:kk + 1] + ts * du_n[kk:kk + 1]
                     - m[0:1, kk:kk + 1]) \
                    * (fBk / (m[0:1, kk + 3:kk + 4] - m[0:1, kk:kk + 1]))
                u = jnp.clip(u, 0.0, fBk - 1e-3)
                v0 = jnp.floor(u)
                frs.append(u - v0)
                lid = lid * fBk + v0
            lid_i = lid.astype(jnp.int32)
            ohT = jnp.where(ok_n & (rowv_ref[:] == lid_i),
                            1.0, 0.0).astype(jnp.bfloat16)
            out8T = jnp.dot(slabT, ohT,
                            preferred_element_type=jnp.float32)
            w128T = jnp.ones((ROWW, N), jnp.float32)
            for kk in range(3):
                w128T = w128T * ((1.0 - frs[kk])
                                 + bitw_ref[kk] * (2.0 * frs[kk] - 1.0))
            rr = jax.lax.broadcasted_iota(jnp.int32, (FEAT, ROWW), 0)
            rc = jax.lax.broadcasted_iota(jnp.int32, (FEAT, ROWW), 1)
            redT = (rc % FEAT == rr).astype(jnp.float32) \
                .astype(jnp.bfloat16)
            hT = jnp.dot(redT, (out8T * w128T).astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
            sd = jnp.where(ok_n,
                           jnp.exp(jnp.minimum(hT[0:1], 30.0)) * dt, 0.0)
            sd = jnp.minimum(sd, 80.0)
            w1b = w1t_ref[:].astype(jnp.bfloat16)
            a = jnp.maximum(
                jnp.dot(w1b[:, 0:FEAT], sh_n.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                + jnp.dot(w1b[:, FEAT:], hT.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32),
                0.0).astype(jnp.bfloat16)
            a = jnp.maximum(jnp.dot(w2t_ref[:].astype(jnp.bfloat16), a,
                                    preferred_element_type=jnp.float32),
                            0.0).astype(jnp.bfloat16)
            rgbT = jax.nn.sigmoid(
                jnp.dot(w3t_ref[:].astype(jnp.bfloat16), a,
                        preferred_element_type=jnp.float32))
            run = jnp.zeros((1, TPX), jnp.float32)
            rgbw = jnp.zeros((3, TPX), jnp.float32)
            depw = jnp.zeros((1, TPX), jnp.float32)
            for si in range(S):
                sl = slice(si * TPX, (si + 1) * TPX)
                sd_si = sd[:, sl]
                w_si = jnp.exp(-run) * (1.0 - jnp.exp(-sd_si))
                rgbw = rgbw + w_si * rgbT[:, sl]
                depw = depw + w_si * ts[:, sl]
                run = run + sd_si
            tau_c = run
            T_bef = jnp.where(live, jnp.exp(-tau_tot), 0.0)
            upd_tau = upd_tau + jnp.where(live, tau_c, 0.0)
            upd_rgb = upd_rgb + T_bef * rgbw
            upd_dep = upd_dep + T_bef * depw
            upd_cnt = upd_cnt + (hit & live).astype(jnp.float32)
            tau_tot = tau_tot + jnp.where(live, tau_c, 0.0)
        outT_ref[0:1, :] += upd_tau
        outT_ref[1:4, :] += upd_rgb
        outT_ref[4:5, :] += upd_dep
        outT_ref[5:6, :] += upd_cnt


@functools.partial(jax.jit, static_argnames=(
    "S", "dt", "tau_max", "P", "Bk", "interpret"))
def brick_field_tiles_wl(pool_blk, meta, rays, sh, pool3T, w1, w2, w3,
                         wt, wl, wn, wf, *, S: int, dt: float,
                         tau_max: float, P: int = 16, Bk: int = 8,
                         init=None, interpret: bool = False):
    """Worklist-grid transposed entry (see _kernel_wl).

    pool_blk/meta: the (T*Lp) padded pairs tables (any layout — wl rows
        address them absolutely; each wl must be P-aligned).  pool_blk
        is gathered down to the worklist-sized per-step id table here
        (only that table rides the scalar-prefetch SMEM budget).
    wt/wl/wn/wf: (Ns,) int32 worklist — tile id, first pairs row, live
        slots (<= P; 0 = pad step), first-group-of-tile flag.  Steps of
        one tile must be consecutive; pad steps must repeat the last
        real wt.
    init: (T*TPX, 8) accumulator carry-in (None = zeros).  Output blocks
        of tiles NOT in the worklist are UNDEFINED — callers must select
        against `init` using their own tile mask.
    """
    T = rays.shape[0] // TPX
    Ns = wt.shape[0]
    # scalar-prefetch operands live in SMEM: 4 worklist arrays (Ns each)
    # + the per-step slab-id table (Ns*P).  Beyond ~800 KB the Mosaic
    # compile helper dies with an opaque HTTP 500 (measured: cap 5120 x
    # P16 = 407 KB ok, cap 16384 x P16 = 1.3 MB crash) — fail loud with
    # the actionable knob instead.
    smem_bytes = Ns * 4 * (4 + P)
    assert smem_bytes <= 800 * 1024, (
        f"worklist scalar-prefetch needs {smem_bytes/1024:.0f} KB SMEM "
        f"(cap {Ns} x P {P}); reduce wl_cap or pbatch to fit ~800 KB")
    vox = Bk * Bk * Bk
    raysT = rays.reshape(T, TPX, 8).swapaxes(1, 2).reshape(T * 8, TPX)
    shT = sh.reshape(T, TPX, FEAT).swapaxes(1, 2).reshape(T * FEAT, TPX)
    if init is None:
        initT = jnp.zeros((T * 8, TPX), jnp.float32)
    else:
        initT = init.reshape(T, TPX, 8).swapaxes(1, 2).reshape(T * 8, TPX)
    metaP = meta.reshape(-1, 1, 8)
    N = S * TPX
    rowv = jax.lax.broadcasted_iota(jnp.int32, (vox, N), 0)
    bitw = jnp.stack([jnp.broadcast_to(
        ((jnp.arange(ROWW, dtype=jnp.int32)[:, None] // FEAT >> k) & 1
         ).astype(jnp.float32), (ROWW, N)) for k in range(3)])
    ws = jnp.take(pool_blk.astype(jnp.int32),
                  (wl[:, None] + jnp.arange(P, dtype=wl.dtype)[None])
                  .reshape(-1))                              # (Ns*P,)
    slab_specs = [
        pl.BlockSpec((1, ROWW, vox),
                     functools.partial(
                         lambda j, wt_, wl_, wn_, wf_, ws_, k=0:
                         (ws_[j * P + k], 0, 0), k=k))
        for k in range(P)]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(Ns,),
        in_specs=[
            pl.BlockSpec((P, 1, 8),
                         lambda j, wt_, wl_, wn_, wf_, ws_:
                         (wl_[j] // P, 0, 0)),
            pl.BlockSpec((8, TPX), lambda j, wt_, wl_, wn_, wf_, ws_:
                         (wt_[j], 0)),
            pl.BlockSpec((FEAT, TPX), lambda j, wt_, wl_, wn_, wf_, ws_:
                         (wt_[j], 0)),
            pl.BlockSpec((8, TPX), lambda j, wt_, wl_, wn_, wf_, ws_:
                         (wt_[j], 0)),
            *slab_specs,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TPX), lambda j, wt_, wl_, wn_, wf_, ws_:
                               (wt_[j], 0)),
    )
    kern = functools.partial(_kernel_wl, S=S, dt=dt, tau_max=tau_max,
                             P=P, Bk=Bk)
    outT = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * 8, TPX), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Ns * P * S * TPX * (vox * ROWW + 32 * 64
                                          + 64 * 64 + 64 * 3
                                          + ROWW * FEAT),
            bytes_accessed=Ns * P * vox * ROWW * pool3T.dtype.itemsize,
            transcendentals=Ns * P * S * TPX * 4),
    )(wt.astype(jnp.int32), wl.astype(jnp.int32), wn.astype(jnp.int32),
      wf.astype(jnp.int32), ws, metaP, raysT, shT, initT,
      *([pool3T] * P), rowv, bitw, w1.T, w2.T, w3.T)
    return outT.reshape(T, 8, TPX).swapaxes(1, 2).reshape(T * TPX, 8)


def _kernel_rgba(pb_ref, lb_ref, ns_ref, tid_ref, metaT_ref, raysT_ref,
                 initT_ref, slabT_ref, rowv_ref, bitw4_ref, outT_ref, *,
                 S: int, dt: float, inv2s: float, V: int, tau_max: float,
                 Bk: int = 8):
    """RGBA-slab variant of _kernel_t: the slab holds PRE-SHADED per-
    corner [log-sigma, r, g, b] (models/baked_rgba.bake_rgba — the rgb
    MLP is evaluated per voxel corner at bake time with the frame's
    per-voxel view direction), so the body is one (32, vox) matmul +
    trilerp — no MLP, no sh input.  The kernel-cost probe (R4.1)
    measured the per-slot wall as slab bytes + body VPU/MXU time; this
    kernel cuts slab bytes 4x (32 vs 128 lanes) and drops the MLP
    matmuls and sh lane-tiles from the body.  init carry as in
    _kernel_tp (segmented rendering)."""
    t = pl.program_id(0)
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _init():
        outT_ref[:] = initT_ref[:]

    rays = raysT_ref[:]                     # (8, 64)
    o = rays[0:3]
    du = rays[3:6]
    t1 = rays[6:7]
    t2 = rays[7:8]
    valid = l < ns_ref[t]
    m = metaT_ref[0]                        # (1, 8)

    inv_d = 1.0 / jnp.where(jnp.abs(du) > 1e-10, du,
                            jnp.where(du >= 0, 1e-10, -1e-10))
    ta, tb = t1, t2
    for k in range(3):
        a = (m[0:1, k:k + 1] - o[k:k + 1]) * inv_d[k:k + 1]
        b = (m[0:1, k + 3:k + 4] - o[k:k + 1]) * inv_d[k:k + 1]
        ta = jnp.maximum(ta, jnp.minimum(a, b))
        tb = jnp.minimum(tb, jnp.maximum(a, b))
    n0 = jnp.maximum(jnp.ceil((ta - t1) / dt - 0.5), 0.0)
    n1 = jnp.floor((tb - t1) / dt - 0.5)
    hit = valid & (tb > ta) & (n1 >= n0) & (t2 > 0)

    tau_tot = outT_ref[0:1, :]                              # (1, 64)
    live = tau_tot < tau_max
    work = jnp.any(hit & live)

    @pl.when(work)
    def _body():
        N = S * TPX
        slabT = slabT_ref[0].astype(jnp.bfloat16)           # (32, vox)

        def lane_tile(x):
            return jnp.concatenate([x] * S, axis=1)

        s_n = (jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
               // TPX).astype(jnp.float32)
        n_s = lane_tile(n0) + s_n
        hitf = jnp.where(hit, 1.0, 0.0)
        ok_n = (lane_tile(hitf) > 0.5) & (n_s <= lane_tile(n1))
        ts = lane_tile(t1) + (n_s + 0.5) * dt
        o_n = lane_tile(o)
        du_n = lane_tile(du)
        # brick-local voxel coords from the meta AABB (see _kernel)
        fBk = float(Bk)
        lid = jnp.zeros((1, N), jnp.float32)
        frs = []
        for k in range(3):
            u = (o_n[k:k + 1] + ts * du_n[k:k + 1] - m[0:1, k:k + 1]) \
                * (fBk / (m[0:1, k + 3:k + 4] - m[0:1, k:k + 1]))
            u = jnp.clip(u, 0.0, fBk - 1e-3)
            v0 = jnp.floor(u)
            frs.append(u - v0)
            lid = lid * fBk + v0
        lid_i = lid.astype(jnp.int32)

        ohT = jnp.where(ok_n & (rowv_ref[:] == lid_i),
                        1.0, 0.0).astype(jnp.bfloat16)      # (vox, N)
        out4T = jnp.dot(slabT, ohT,
                        preferred_element_type=jnp.float32)  # (32, N)
        # trilinear corner weights on 32 lanes (corner = lane // 4)
        w32 = jnp.ones((32, N), jnp.float32)
        for k in range(3):
            w32 = w32 * ((1.0 - frs[k])
                         + bitw4_ref[k] * (2.0 * frs[k] - 1.0))
        rr = jax.lax.broadcasted_iota(jnp.int32, (4, 32), 0)
        rc = jax.lax.broadcasted_iota(jnp.int32, (4, 32), 1)
        redT = (rc % 4 == rr).astype(jnp.float32) \
            .astype(jnp.bfloat16)                           # (4, 32)
        hT = jnp.dot(redT, (out4T * w32).astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)    # (4, N)

        sd = jnp.where(ok_n,
                       jnp.exp(jnp.minimum(hT[0:1], 30.0)) * dt, 0.0)
        sd = jnp.minimum(sd, 80.0)
        # baked rgb values are already sigmoided; trilerp can overshoot
        # [0, 1] only by bf16 rounding — clamp
        rgbT = jnp.clip(hT[1:4], 0.0, 1.0)                  # (3, N)

        run = jnp.zeros((1, TPX), jnp.float32)
        rgbw = jnp.zeros((3, TPX), jnp.float32)
        depw = jnp.zeros((1, TPX), jnp.float32)
        for si in range(S):
            sl = slice(si * TPX, (si + 1) * TPX)
            sd_si = sd[:, sl]
            w_si = jnp.exp(-run) * (1.0 - jnp.exp(-sd_si))
            rgbw = rgbw + w_si * rgbT[:, sl]
            depw = depw + w_si * ts[:, sl]
            run = run + sd_si
        tau_c = run

        T_bef = jnp.where(live, jnp.exp(-tau_tot), 0.0)
        outT_ref[0:1, :] += jnp.where(live, tau_c, 0.0)
        outT_ref[1:4, :] += T_bef * rgbw
        outT_ref[4:5, :] += T_bef * depw
        outT_ref[5:6, :] += (hit & live).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "S", "dt", "inv2s", "V", "tau_max", "Lcall", "Bk", "interpret"))
def brick_field_tiles_rgba(pool_blk, meta, rays, poolRGBA, *, S: int,
                           dt: float, inv2s: float, V: int,
                           tau_max: float, tid=None, lbase=None,
                           nslots=None, Lcall: int = 0, Bk: int = 8,
                           init=None, interpret: bool = False):
    """RGBA-slab entry: contract of brick_field_tiles_t minus sh/MLP
    weights; poolRGBA is (n_blocks, 32, vox) pre-shaded per-corner
    [log-sigma, r, g, b] lanes (corner = lane // 4, channel = lane % 4,
    corner bit order as models/baked.trilerp_w8).  init as in
    brick_field_tiles_tp (segmented-rendering carry)."""
    T = rays.shape[0] // TPX
    tid, lbase, nslots, Lcall = _list_scalars(pool_blk, rays, tid, lbase,
                                              nslots, Lcall)
    Tb = tid.shape[0]
    vox = Bk * Bk * Bk
    raysT = rays.reshape(T, TPX, 8).swapaxes(1, 2).reshape(T * 8, TPX)
    metaT = meta.reshape(-1, 1, 8)
    if init is None:
        initT = jnp.zeros((T * 8, TPX), jnp.float32)
    else:
        initT = init.reshape(T, TPX, 8).swapaxes(1, 2).reshape(T * 8, TPX)
    N = S * TPX
    rowv = jax.lax.broadcasted_iota(jnp.int32, (vox, N), 0)
    bitw4 = jnp.stack([jnp.broadcast_to(
        ((jnp.arange(32, dtype=jnp.int32)[:, None] // 4 >> k) & 1
         ).astype(jnp.float32), (32, N)) for k in range(3)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Tb, Lcall),
        in_specs=[
            pl.BlockSpec((1, 1, 8),
                         lambda t, l, pb, lb, ns, td: (lb[t] + l, 0, 0)),
            pl.BlockSpec((8, TPX), lambda t, l, pb, lb, ns, td:
                         (td[t], 0)),
            pl.BlockSpec((8, TPX), lambda t, l, pb, lb, ns, td:
                         (td[t], 0)),
            pl.BlockSpec((1, 32, vox),
                         lambda t, l, pb, lb, ns, td:
                         (pb[lb[t] + l], 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, TPX), lambda t, l, pb, lb, ns, td:
                               (td[t], 0)),
    )
    kern = functools.partial(_kernel_rgba, S=S, dt=dt, inv2s=inv2s,
                             V=V, tau_max=tau_max, Bk=Bk)
    outT = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T * 8, TPX), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Tb * Lcall * S * TPX * (vox * 32 + 32 * 4),
            bytes_accessed=Tb * Lcall * vox * 32
            * poolRGBA.dtype.itemsize,
            transcendentals=Tb * Lcall * S * TPX * 4),
    )(pool_blk, lbase, nslots, tid, metaT, raysT, initT, poolRGBA,
      rowv, bitw4)
    return outT.reshape(T, 8, TPX).swapaxes(1, 2).reshape(T * TPX, 8)


def brick_field_rgba_reference(pool_blk, meta, rays, poolRGBA, *, S, dt,
                               inv2s, V, tau_max, tid=None, lbase=None,
                               nslots=None, Bk: int = 8):
    """Numpy restatement of the RGBA kernel for golden tests (same list
    addressing / termination / ordering as brick_field_tiles_reference)."""
    pool_blk = np.asarray(pool_blk)
    meta = np.asarray(meta, np.float32)
    rays = np.asarray(rays, np.float32)
    poolRGBA = np.asarray(poolRGBA, np.float32)      # (nb, 32, vox)
    T = rays.shape[0] // TPX
    Lp = pool_blk.shape[0] // T
    if tid is None:
        tid = np.arange(T, dtype=np.int32)
    if lbase is None:
        lbase = tid.astype(np.int32) * Lp
    if nslots is None:
        nslots = np.full(tid.shape, Lp, np.int32)
    out = np.zeros((T * TPX, 8), np.float32)
    for b in range(len(tid)):
        t = int(tid[b])
        sl = slice(t * TPX, (t + 1) * TPX)
        o, du = rays[sl, 0:3], rays[sl, 3:6]
        t1, t2 = rays[sl, 6], rays[sl, 7]
        for l in range(int(nslots[b])):
            m = meta[int(lbase[b]) + l]
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
            slabT = poolRGBA[pool_blk[int(lbase[b]) + l]]    # (32, vox)
            tau_c = np.zeros(TPX)
            rgbw = np.zeros((TPX, 3))
            depw = np.zeros(TPX)
            for s in range(S):
                n_s = n0 + s
                s_ok = hit & (n_s <= n1)
                ts = t1 + (n_s + 0.5) * dt
                xyz = o + ts[:, None] * du
                u = np.clip((xyz - m[0:3][None]) * Bk
                            / (m[3:6] - m[0:3])[None], 0.0, Bk - 1e-3)
                v0 = np.floor(u)
                frac = u - v0
                lid = ((v0[:, 0] * Bk + v0[:, 1]) * Bk
                       + v0[:, 2]).astype(np.int64)
                rows = slabT[:, lid].T.reshape(TPX, 8, 4)    # (TPX, 8, 4)
                w8 = np.ones((TPX, 8))
                for k in range(3):
                    bit = (np.arange(8)[None] >> k) & 1
                    w8 = w8 * np.where(bit == 1, frac[:, k:k + 1],
                                       1.0 - frac[:, k:k + 1])
                h4 = np.einsum("nc,ncf->nf", w8, rows)       # (TPX, 4)
                sd = np.where(s_ok,
                              np.exp(np.minimum(h4[:, 0], 30.0)) * dt,
                              0.0)
                sd = np.minimum(sd, 80.0)
                rgb_s = np.clip(h4[:, 1:4], 0.0, 1.0)
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
# The two-phase sigma-prepass kernel family (_kernel_sig /
# brick_field_sigma_tp / brick_field_sigma_reference) was measured and
# DELETED in round 4: at eps=1e-3 it pruned only ~21% of slots while
# costing a full extra pass over the uncompacted lists, and no chip
# sweep ever put a prepass config ahead of the flat exact-cull design
# at equal exactness (DESIGN_NOTES R4.2/R4.4; VERDICT r3 item 3 kill
# criterion: keep only if >= 1.7x FPS at <= 0.1 dB — it delivered 1.0x).




def brick_field_tiles_reference(pool_blk, meta, rays, sh, pool3, w1,
                                w2, w3, *, S, dt, inv2s, V, tau_max,
                                tid=None, lbase=None, nslots=None,
                                Bk: int = 8):
    """Pure-numpy restatement of the kernel semantics (same l ordering,
    same early-termination rule, same tid/lbase/nslots list addressing)
    for golden tests."""
    pool_blk = np.asarray(pool_blk)
    meta = np.asarray(meta, np.float32)
    rays = np.asarray(rays, np.float32)
    sh = np.asarray(sh, np.float32)
    pool3 = np.asarray(pool3, np.float32)
    w1, w2, w3 = (np.asarray(w, np.float32) for w in (w1, w2, w3))
    T = rays.shape[0] // TPX
    Lp = pool_blk.shape[0] // T
    if tid is None:
        tid = np.arange(T, dtype=np.int32)
    if lbase is None:
        lbase = tid.astype(np.int32) * Lp
    if nslots is None:
        nslots = np.full(tid.shape, Lp, np.int32)
    out = np.zeros((T * TPX, 8), np.float32)
    for b in range(len(tid)):
        t = int(tid[b])
        sl = slice(t * TPX, (t + 1) * TPX)
        o, du = rays[sl, 0:3], rays[sl, 3:6]
        t1, t2 = rays[sl, 6], rays[sl, 7]
        out[sl] = 0.0
        for l in range(int(nslots[b])):
            m = meta[int(lbase[b]) + l]
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
            slab = pool3[pool_blk[int(lbase[b]) + l]]      # (vox, 128)
            tau_c = np.zeros(TPX)
            rgbw = np.zeros((TPX, 3))
            depw = np.zeros(TPX)
            for s in range(S):
                n_s = n0 + s
                s_ok = hit & (n_s <= n1)
                ts = t1 + (n_s + 0.5) * dt
                xyz = o + ts[:, None] * du
                u = np.clip((xyz - m[0:3][None]) * Bk
                            / (m[3:6] - m[0:3])[None], 0.0, Bk - 1e-3)
                v0 = np.floor(u)
                frac = u - v0
                lid = ((v0[:, 0] * Bk + v0[:, 1]) * Bk
                       + v0[:, 2]).astype(np.int64)
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
    models/render_brick.render_brick's S rule).

    For MIXED-resolution bakes (models/baked_mixed.py) pass the COARSEST
    level's voxel_res: S must cover the widest brick's diagonal, and a
    too-small S silently truncates coarse-brick windows."""
    s = min(0.5, scale)
    vox_w = 2.0 * s / voxel_res
    dt = math.sqrt(3.0) / max_samples
    return int(math.ceil(block * vox_w * math.sqrt(3.0) / dt)) + 1
