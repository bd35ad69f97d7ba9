"""Occupancy/density-grid maintenance (fully jittable, no host sync).

TPU-native rebuild of reference `ngp_pl/models/networks.py:119-252`:
  * all-cell enumeration                    (networks.py:119-131)
  * uniform + occupied cell sampling       (networks.py:133-157) — the
    `torch.nonzero` dynamic-shape sampling becomes a cumsum+searchsorted draw
    over the occupancy mask with static sample counts
  * mark_invisible_cells                   (networks.py:159-214)
  * update_density_grid (EMA + erode + threshold) (networks.py:216-252)

Layout: the density grid is raster (C, G, G, G) float32 — index [c, x, y, z] —
and the "bitfield" is simply the bool array `grid > threshold` (the packed
uint8 form of vren is available via ops.morton.packbits for tools/ckpts).
Cell centers follow the reference mapping:
    world(c, i) = (i / (G-1) * 2 - 1) * (s - s/G),  s = min(2^(c-1), scale)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEAR_DISTANCE = 0.05  # rendering.py:8


def cell_coords(grid_size: int) -> jnp.ndarray:
    """(G^3, 3) int32 raster-order cell coordinates."""
    g = jnp.arange(grid_size, dtype=jnp.int32)
    x, y, z = jnp.meshgrid(g, g, g, indexing="ij")
    return jnp.stack([x, y, z], -1).reshape(-1, 3)


def _cascade_bound(c: int, scale: float) -> float:
    return min(2.0 ** (c - 1), scale)


def cells_to_world(coords, cascade: int, scale: float, grid_size: int):
    """Cell integer coords -> world-space cell centers for one cascade."""
    s = _cascade_bound(cascade, scale)
    half = s / grid_size
    return (coords.astype(jnp.float32) / (grid_size - 1) * 2 - 1) * (s - half)


@partial(jax.jit, static_argnames=("grid_size", "cascades", "scale",
                                   "img_w", "img_h"))
def mark_invisible_cells(K, poses, *, img_w: int, img_h: int, grid_size: int,
                         cascades: int, scale: float):
    """Initial density grid: 0 for camera-covered cells, -1 for invisible or
    too-near cells (they stay dead forever).

    K: (3, 3); poses: (N, 3, 4) c2w.  Returns (C, G, G, G) float32.
    """
    hi = jax.lax.Precision.HIGHEST
    w2c_R = jnp.swapaxes(poses[:, :3, :3], 1, 2)          # (N, 3, 3)
    w2c_T = -jnp.einsum("nij,nj->ni", w2c_R, poses[:, :3, 3], precision=hi)

    coords = cell_coords(grid_size)                        # (G^3, 3)
    grids = []
    for c in range(cascades):
        xyz_w = cells_to_world(coords, c, scale, grid_size)  # (G^3, 3)

        def visible(chunk):
            # chunk: (M, 3) world points -> (M,) validity in {0., -1.}
            xyz_c = (jnp.einsum("nij,mj->nmi", w2c_R, chunk, precision=hi)
                     + w2c_T[:, None, :])                  # (N, M, 3)
            uvd = jnp.einsum("ij,nmj->nmi", K, xyz_c, precision=hi)
            z = uvd[..., 2]
            uv = uvd[..., :2] / jnp.where(jnp.abs(z[..., None]) > 1e-9,
                                          z[..., None], 1e-9)
            in_image = ((z >= 0)
                        & (uv[..., 0] >= 0) & (uv[..., 0] < img_w)
                        & (uv[..., 1] >= 0) & (uv[..., 1] < img_h))
            covered = ((z >= NEAR_DISTANCE) & in_image).any(0)   # (M,)
            too_near = ((z < NEAR_DISTANCE) & in_image).any(0)
            valid = covered & ~too_near
            return jnp.where(valid, 0.0, -1.0)

        n_chunks = 32
        vals = jax.lax.map(visible,
                           xyz_w.reshape(n_chunks, -1, 3)).reshape(-1)
        grids.append(vals)
    return jnp.stack(grids).reshape(cascades, grid_size, grid_size, grid_size)


def _sample_occupied(key, occ_flat, m: int):
    """Draw m cell indices ~ uniform over True entries of occ_flat (G^3,).
    Falls back to uniform cells when nothing is occupied."""
    cnt = occ_flat.sum()
    cs = jnp.cumsum(occ_flat.astype(jnp.int32))
    u = jax.random.uniform(key, (m,)) * jnp.maximum(cnt, 1)
    idx = jnp.searchsorted(cs, u.astype(jnp.int32) + 1, side="left")
    idx = jnp.clip(idx, 0, occ_flat.shape[0] - 1)
    rand_idx = jax.random.randint(jax.random.fold_in(key, 1), (m,), 0,
                                  occ_flat.shape[0])
    return jnp.where(cnt > 0, idx, rand_idx)


def _segment_max_dense(idx, vals, n: int):
    """Dense per-cell maximum of `vals` grouped by cell index — the
    scatter-free analog of `zeros(n).at[idx].max(vals)`.

    XLA's scatter-max runs at ~16M rows/s on v5e; this sort + cummax +
    marker-merge pipeline (same trick as ops/packed_hash backward) is ~3x
    faster at the 1M-row grid-update size.  One ascending 2-key sort of
    [contributions ++ one marker per cell] places each cell's marker after
    its contributions; a running max then carries each cell's maximum into
    its marker, and a second sort extracts markers in cell order."""
    m = idx.shape[0]
    # FUSED key (cell*2 | is_marker) -> single-key sort with one value
    # operand instead of a 2-key sort dragging a third lane (same trick as
    # ops/packed_hash backward): markers still order after their cell's
    # contributions.
    k_all = jnp.concatenate([idx * 2,
                             jnp.arange(n, dtype=idx.dtype) * 2 + 1])
    v_all = jnp.concatenate([vals, jnp.zeros((n,), vals.dtype)])
    ks_f, vs = jax.lax.sort((k_all, v_all), num_keys=1)
    ks = ks_f >> 1
    tags = ks_f & 1
    # segmented running max (reset at cell boundaries) via associative scan
    boundary = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])

    def combine(a, b):
        m1, r1 = a
        m2, r2 = b
        return jnp.where(r2, m2, jnp.maximum(m1, m2)), r1 | r2

    run, _ = jax.lax.associative_scan(combine, (vs, boundary))
    # extract marker rows in cell order
    pos = jnp.arange(m + n, dtype=jnp.int32)
    mk = jnp.where(tags == 1, ks, jnp.int32(n))
    _, mrows = jax.lax.sort((mk, pos), num_keys=1)
    q = jax.lax.dynamic_slice_in_dim(mrows, 0, n)
    return jnp.maximum(jnp.take(run, q), 0.0)


def _erode(grid):
    """Decay cells that are a positive local max of their 3x3x3 neighborhood
    (the reference's floater killer, networks.py:242-247)."""
    mp = jax.lax.reduce_window(grid, -jnp.inf, jax.lax.max,
                               (1, 3, 3, 3), (1, 1, 1, 1),
                               [(0, 0), (1, 1), (1, 1), (1, 1)])
    return (grid == mp) & (mp > 0)


def update_density_grid(density_grid, density_fn, key, *, scale: float,
                        density_threshold: float, warmup: bool,
                        decay: float = 0.95, erode: bool = False,
                        eval_chunks: int = 32, axis_name=None,
                        sample_div: int = 4):
    """One density-grid maintenance step.

    density_grid: (C, G, G, G) float32 (negatives = permanently invisible);
    density_fn: (M, 3) world xyz -> (M,) sigma.
    Returns (new_density_grid, occ_bool (C, G, G, G)).

    With `axis_name` (inside shard_map/pmap), the sampled-cell density
    evaluation is SHARDED over the mesh — every replica draws the SAME
    sample set from the SAME key (cheap: indices + jitter), evaluates only
    its 1/n_replicas slice, and the per-cell maxima are pmax-merged
    (SURVEY.md §5.8: the TPU-native analog of vren's replicated grid
    update).  Because max is exact-associative, the merged grid is
    BIT-IDENTICAL to the serial update with the same key — asserted by
    `__graft_entry__.dryrun_multichip` and tests/test_parallel_hardening.py.

    Bit-identity requires the density evals to see the SAME batch shape in
    both paths (XLA tiles a matmul's K-reduction differently per shape):
    the sample set is split into `eval_chunks` fixed-shape virtual chunks
    — a shape that depends only on (G, warmup), never on the mesh size —
    and each replica maps density_fn over its contiguous group of chunks.
    """
    C, G = density_grid.shape[0], density_grid.shape[1]
    flat = density_grid.reshape(C, -1)
    tmp = jnp.zeros_like(flat)
    n_rep = (jax.lax.axis_size(axis_name) if axis_name else 1)
    rep = (jax.lax.axis_index(axis_name) if axis_name else 0)

    for c in range(C):
        kc = jax.random.fold_in(key, c)
        if warmup:
            idx = jnp.arange(G ** 3, dtype=jnp.int32)
        else:
            # sample_div=4 is the reference recipe (vren's M=G^3/4 uniform
            # + M occupied).  At the r4 flagship the 2M density evals cost
            # ~13 train steps' worth of field evals per update — larger
            # divisors trade occupancy-refresh rate for throughput (A/B
            # gated on held-out PSNR, tools/r3_train_ab.py).
            m = G ** 3 // sample_div
            k1, k2, k3 = jax.random.split(kc, 3)
            coords_u = jax.random.randint(k1, (m, 3), 0, G, dtype=jnp.int32)
            idx_u = (coords_u[:, 0] * G + coords_u[:, 1]) * G + coords_u[:, 2]
            idx_o = _sample_occupied(k2, flat[c] > 0, m)
            idx = jnp.concatenate([idx_u, idx_o])
        coords = jnp.stack([idx // (G * G), (idx // G) % G, idx % G], -1)
        xyz = cells_to_world(coords, c, scale, G)
        half = _cascade_bound(c, scale) / G
        jitter = (jax.random.uniform(jax.random.fold_in(kc, 7),
                                     xyz.shape) * 2 - 1) * half
        pts = xyz + jitter
        n_total = idx.shape[0]
        assert n_total % eval_chunks == 0 and eval_chunks % n_rep == 0, (
            f"eval_chunks={eval_chunks} must divide sample count {n_total} "
            f"and be a multiple of the mesh size {n_rep}")
        pts = pts.reshape(eval_chunks, -1, 3)
        if axis_name:
            vg = eval_chunks // n_rep        # virtual chunks per replica
            idx = jax.lax.dynamic_slice_in_dim(
                idx.reshape(eval_chunks, -1), rep * vg, vg).reshape(-1)
            pts = jax.lax.dynamic_slice_in_dim(pts, rep * vg, vg)
        sigmas = jax.lax.map(density_fn, pts).reshape(-1)
        # scatter-free per-cell max (scatter-max measured ~3x slower)
        tmp = tmp.at[c].set(_segment_max_dense(idx, sigmas, G ** 3))

    if axis_name:
        tmp = jax.lax.pmax(tmp, axis_name)
    new = jnp.where(flat < 0, flat, jnp.maximum(flat * decay, tmp))
    new = new.reshape(density_grid.shape)
    if erode:
        new = jnp.where(_erode(new), new * decay, new)

    pos = new > 0
    mean_density = jnp.where(pos, new, 0.0).sum() / jnp.maximum(
        pos.sum(), 1).astype(new.dtype)
    occ = new > jnp.minimum(mean_density, density_threshold)
    return new, occ


def pack_occupancy_blocks(occ, block: int = 8) -> jnp.ndarray:
    """occ: (1, G, G, G) bool -> (G^3, 16) int32 exact-occupancy BLOCK rows
    for the one-phase block marcher (ops/march_block.py).

    Row m (raster cell index, anchor) holds the exact occupancy of the
    forward 8^3 block: bit o = dx*64 + dy*8 + dz of word o // 32 is
    occ[anchor + (dx, dy, dz)], (dx, dy, dz) in {0..7}^3 (out-of-grid = 0).
    One 64-byte row gather therefore answers the exact occupancy test for
    every candidate of a marching group whose cell span is <= 7 per axis
    (16-32 consecutive candidates at the flagship lattices) — ~4x fewer
    gather rows AND no coarse/fine phase split vs pack_occupancy_u8 +
    march_rays_train_seg.  Single-cascade scenes only (the flagship).

    Construction is 8 z-shifted adds (byte packing) + 64 xy-shifted ORs:
    ~72 vectorized ops over G^3 cells, same order as the dilation passes
    of pack_occupancy_u8.
    """
    assert occ.shape[0] == 1, "block rows are single-cascade only"
    assert block == 8, "only 8^3 (512-bit, 16-word) blocks are implemented"
    G = occ.shape[1]
    padded = jnp.pad(occ[0].astype(jnp.int32), [(0, 7)] * 3)
    # zb[x, y, z] = bits dz of occ[x, y, z + dz], dz in {0..7}
    zb = padded[:, :, 0:G]
    for dz in range(1, 8):
        zb = zb | (padded[:, :, dz:dz + G] << dz)
    words = []
    for w in range(16):
        dx = w // 2
        acc = None
        for sub in range(4):
            dy = (w % 2) * 4 + sub
            t = zb[dx:dx + G, dy:dy + G, :] << (8 * sub)
            acc = t if acc is None else acc | t
        words.append(acc)
    return jnp.stack(words, -1).reshape(G * G * G, 16)


def pack_occupancy_blocks4(occ, stride: int = 4) -> jnp.ndarray:
    """Stride-anchored 8^3 block rows for the two-phase block marcher
    (ops/march_block.march_rays_train_block2).

    Row a (raster index over the (G//stride)^3 anchor lattice) holds the
    exact occupancy of cells [stride*a .. stride*a + 7] per axis, same bit
    layout as pack_occupancy_blocks.  At stride 4 / G=128 the table is
    32^3 x 64 B = 2 MiB — 64x smaller than the per-cell-anchored table, so
    fine-phase gathers run in the fast working-set regime of the v5e
    gather law (DESIGN_NOTES.md) instead of the >=32 MiB floor.  The
    marcher must keep group cell-spans <= BLOCK - stride (see
    march_block.block2_group)."""
    G = occ.shape[1]
    assert G % stride == 0
    full = pack_occupancy_blocks(occ)
    i = jnp.arange(G // stride, dtype=jnp.int32) * stride
    flat = ((i[:, None, None] * G + i[None, :, None]) * G
            + i[None, None, :]).reshape(-1)
    return jnp.take(full, flat, axis=0)


def pack_super_liveness(occ, window: int, stride: int = 8) -> jnp.ndarray:
    """((G//stride)^3,) int32 forward-window liveness table: entry a is 1
    iff any cell in [stride*a .. stride*a + window - 1]^3 is occupied.

    One 4-byte gather from this (~4 KB at G=128) table answers "does this
    64-candidate marching supergroup touch any content?" for the super
    phase of march_rays_train_block2 — background rays then never pay
    fine block-row gathers or per-candidate position math.  `window` must
    be >= supergroup cell-span + stride (march_block.super_window)."""
    assert occ.shape[0] == 1, "super liveness is single-cascade only"
    G = occ.shape[1]
    assert G % stride == 0
    r = jax.lax.reduce_window(occ[0], False, jax.lax.bitwise_or,
                              (window,) * 3, (stride,) * 3,
                              [(0, window - 1)] * 3)
    return r.astype(jnp.int32).reshape(-1)


def pack_occupancy_u8(occ, dilation_radius: int = 2,
                      super_radius: int = 0) -> jnp.ndarray:
    """occ: (C, G, G, G) bool -> packed int32 word grid for the segment
    marchers (ops/march_seg.py).  Per-cell bit layout:

      bit 0            occupied (this cell)
      bit 1            occupied within Chebyshev radius `dilation_radius`
      bit 2            occupied within `super_radius` (3-phase marcher;
                       only when super_radius > 0)
      bits 3..29       exact occupancy of the 3x3x3 FORWARD block: bit
                       3 + dx*9 + dy*3 + dz = occ[cell + (dx, dy, dz)],
                       (dx, dy, dz) in {0, 1, 2}^3 (out-of-grid = 0).
                       One word gather therefore answers the exact test
                       for EVERY candidate of a marching group whose cell
                       span is <= 2 per axis (march_seg phase 2) — 8x
                       fewer gather rows than a per-candidate lookup.

    bit 3 duplicates bit 0 (dx=dy=dz=0) so per-candidate callers keep
    using bit 0 unchanged.  (Name kept from the original uint8 layout —
    the array has been int32 since the block-word upgrade.)"""
    def dilate(r):
        # Chebyshev dilation is separable: three 1-D max passes cost
        # (2r+1)*3 ops/cell vs (2r+1)^3 for the cubic window
        k = 2 * r + 1
        out_d = occ
        for axis in (1, 2, 3):
            dims = [1, 1, 1, 1]
            dims[axis] = k
            pads = [(0, 0)] * 4
            pads[axis] = (r, r)
            out_d = jax.lax.reduce_window(out_d, False, jax.lax.bitwise_or,
                                          tuple(dims), (1, 1, 1, 1), pads)
        return out_d

    out = occ.astype(jnp.int32) | (dilate(dilation_radius
                                          ).astype(jnp.int32) << 1)
    if super_radius > 0:
        out = out | (dilate(super_radius).astype(jnp.int32) << 2)
    # forward 3^3 block bits: shifted copies with zero padding at the far
    # faces (occ[c + d] for d in {0,1,2}^3)
    G = occ.shape[1]
    padded = jnp.pad(occ, [(0, 0)] + [(0, 2)] * 3)
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                blk = padded[:, dx:dx + G, dy:dy + G, dz:dz + G]
                out = out | (blk.astype(jnp.int32)
                             << (3 + dx * 9 + dy * 3 + dz))
    return out
