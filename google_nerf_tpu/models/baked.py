"""Baked sparse-voxel field — the deployment/serving render path.

Why: test-time rendering of the live NGP field costs L (or 8*L) gather
rows per sample and the v5e gather ceiling (~130M rows/s) caps that at a
few FPS.  Baking evaluates the trained field ONCE onto a sparse voxel
pool and then renders with TWO gather rows per sample:

  row 1: block id        — dense (Gb^3,) int32 grid (1 MB-scale)
  row 2: voxel feature   — pool row holding all 8 trilinear corners of
                           the voxel (8 x 16 features, bf16 = 256 B)

The per-cell packed-corner layout costs nothing here: every copy of a
shared corner is written with the SAME field value during baking (unlike
the trainable packed encoder, where independently-trained copies break C0
continuity) and there is no hashing, hence no collisions.  Color stays
view-dependent: the baked features are the sigma-MLP's 16-dim geometry
output h (sigma = trunc_exp(h[0]), reference `networks.py:85,96-98`), and
the rgb MLP runs per included sample exactly as in the live field.

Analog: instant-ngp's "snapshot" / SNeRG-class baked serving renderers.
The reference repo has no baking path — its FPS comes from CUDA-speed
gathers; this is the TPU-native route to the same headline.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.models.mlp import mlp_apply
from google_nerf_tpu.models.ngp import NGPConfig, ngp_density
from google_nerf_tpu.models.encoders import sh_encode_deg4
from google_nerf_tpu.ops.trunc_exp import trunc_exp


def baked_extent(cfg: NGPConfig) -> float:
    """Half-width of the baked voxel grid.

    Only cascade 0 is baked, so the grid must span exactly the cascade-0
    occupancy bound, min(2^-1, scale) (`ops/grid.py:_cascade_bound`).
    Using min(1, scale) here stretched occ[0] over [-1, 1] for any
    0.5 < scale <= 1, so block selection and sigma gating read the wrong
    occupancy cells (geometrically misplaced bake)."""
    return min(0.5, cfg.scale)


@dataclasses.dataclass(frozen=True)
class BakedConfig:
    voxel_res: int = 512          # voxels per axis over [-scale, scale]
    block: int = 8                # voxels per block edge
    feat_dim: int = 16            # geo features per corner (h)
    # pool storage dtype.  The serving renderers are gather-BYTE bound
    # (DESIGN_NOTES: cost ~= a + b*row_bytes), so "float8_e4m3fn" halves
    # the dominant cost vs bf16; measured fidelity cost on the procedural
    # scene is small (tests/test_render_brick.py::test_fp8_pool).
    dtype: str = "bfloat16"

    @property
    def block_res(self) -> int:
        return self.voxel_res // self.block


def bake(params, cfg: NGPConfig, occ, bcfg: BakedConfig = BakedConfig(),
         chunk: int = 1048576):
    """Evaluate the trained field onto a sparse voxel pool.

    occ: (C, G, G, G) bool occupancy (only cascade 0 is baked; the baked
    path targets bounded scenes).  Returns dict:
      block_map (Gb^3,) int32: block id -> pool block index (-1 = empty)
      pool (n_blocks * block^3, 8 * feat_dim) baked corner features
      cfg/bcfg echoes for the renderer.
    """
    V, Bk = bcfg.voxel_res, bcfg.block
    Gb = bcfg.block_res
    G = occ.shape[1]
    s = baked_extent(cfg)

    # occupied blocks: a block is baked iff any occupancy cell it overlaps
    # is set (dilate by 1 cell for trilerp support at boundaries; pad-based
    # so content at one face does not wrap spurious blocks to the other)
    occ0 = np.asarray(occ[0])
    occ_p = np.pad(occ0, 1)
    occ_d = np.zeros_like(occ0)
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                occ_d |= occ_p[dx:dx + G, dy:dy + G, dz:dz + G]
    # map occupancy cells (G^3 over [-s, s]) onto block grid (Gb^3)
    if G >= Gb:
        f = G // Gb
        blk_occ = occ_d.reshape(Gb, f, Gb, f, Gb, f).any((1, 3, 5))
    else:
        f = Gb // G
        blk_occ = np.repeat(np.repeat(np.repeat(occ_d, f, 0), f, 1), f, 2)
    blk_ids = np.flatnonzero(blk_occ.reshape(-1)).astype(np.int32)
    n_blocks = int(blk_ids.size)
    block_map = np.full((Gb ** 3,), -1, np.int32)
    block_map[blk_ids] = np.arange(n_blocks, dtype=np.int32)

    # Per block, evaluate the field on its (Bk+1)^3 CORNER GRID once, then
    # slice the grid into per-voxel 8-corner rows — shared corners receive
    # identical values by construction (no C0 break, unlike the trainable
    # packed encoder).
    bx = blk_ids // (Gb * Gb)
    by = (blk_ids // Gb) % Gb
    bz = blk_ids % Gb
    origin = np.stack([bx, by, bz], -1).astype(np.int32) * Bk  # (n, 3)
    cg = np.arange(Bk + 1, dtype=np.int32)
    cgrid = np.stack(np.meshgrid(cg, cg, cg, indexing="ij"),
                     -1).reshape(-1, 3)                        # ((Bk+1)^3, 3)
    F = bcfg.feat_dim
    # Entirely device-side bake: each chunk evaluates the field on its
    # blocks' corner grids, slices the per-voxel 8-corner rows, gates
    # sigma, and casts to the pool dtype in ONE jitted program; the pool
    # is born on device (the old numpy loop round-tripped every chunk
    # through the host and was transfer-bound).
    n_cg = (Bk + 1) ** 3
    blocks_per_chunk = max(chunk // n_cg, 1)
    occ0_dev = jnp.asarray(occ0)
    cgrid_dev = jnp.asarray(cgrid)
    voxoff = jnp.stack(
        jnp.meshgrid(*([jnp.arange(Bk, dtype=jnp.int32)] * 3),
                     indexing="ij"), -1).reshape(-1, 3)       # (Bk^3, 3)

    @jax.jit
    def bake_chunk(orig):                                     # (nb, 3) int32
        nb = orig.shape[0]
        pts = orig[:, None, :] + cgrid_dev[None]              # (nb, n_cg, 3)
        xyz = (pts.astype(jnp.float32) / V * 2.0 - 1.0) * s
        feats = ngp_density(params, cfg, xyz.reshape(-1, 3),
                            return_feat=True)[1]
        Cg = feats.reshape(nb, Bk + 1, Bk + 1, Bk + 1, F)
        # voxel (i,j,k) corner c (bits x=LSB, y, z) = Cg[i+ox, j+oy, k+oz]
        rows = jnp.stack([
            Cg[:, ox:ox + Bk, oy:oy + Bk, oz:oz + Bk]
            for c in range(8)
            for ox, oy, oz in [((c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1)]
        ], axis=4).reshape(nb, Bk ** 3, 8, F)
        # occupancy gating: force sigma ~ 0 (pre-activation -30) in voxel
        # cells whose occupancy cell is empty.  The marching renderers
        # never SAMPLE those cells (exact per-sample occupancy test); the
        # brick rasterizer integrates every in-brick sample, so ungated
        # sigma inside kept blocks splits the renderers.  Gating must use
        # the UNDILATED occupancy: the blocks are kept by the dilated
        # grid (trilerp support), but gating by it leaves live sigma in
        # the 1-cell dilation ring that only the raster integrates
        # (measured 22x the true opacity on isolated-cell occupancy).
        gv = orig[:, None, :] + voxoff[None]                  # (nb, Bk^3, 3)
        cell = jnp.clip((gv * G) // V, 0, G - 1)
        m = occ0_dev[cell[..., 0], cell[..., 1], cell[..., 2]]
        rows = rows.at[..., 0].set(
            jnp.where(m[..., None], rows[..., 0], -30.0))
        return rows.reshape(nb * Bk ** 3, 8 * F).astype(
            jnp.dtype(bcfg.dtype))

    origin_dev = jnp.asarray(origin)
    pad_blocks = (-n_blocks) % blocks_per_chunk
    if pad_blocks:
        origin_dev = jnp.concatenate(
            [origin_dev, jnp.zeros((pad_blocks, 3), jnp.int32)])
    parts = [bake_chunk(origin_dev[i:i + blocks_per_chunk])
             for i in range(0, origin_dev.shape[0], blocks_per_chunk)]
    pool = (jnp.concatenate(parts)[:n_blocks * Bk ** 3]
            if len(parts) > 1 else parts[0][:n_blocks * Bk ** 3])
    return dict(
        block_map=jnp.asarray(block_map),
        pool=pool,
        rgb_mlp=params["rgb_mlp"],
        n_blocks=n_blocks,
    )


def trilerp_w8(frac):
    """Trilinear corner weights (..., 8) from in-voxel fractions (..., 3).

    Corner c's offset on axis k is bit k of c (x = LSB) — the ONE
    definition of the pool-row corner order; bake(), baked_field and the
    brick rasterizer's _pair_field all use this helper so the layout
    cannot silently diverge between the writers and the readers."""
    offs = jnp.asarray([[(c >> k) & 1 for k in range(3)]
                        for c in range(8)], frac.dtype)
    w = jnp.where(offs == 1, frac[..., None, :], 1.0 - frac[..., None, :])
    return w[..., 0] * w[..., 1] * w[..., 2]


def baked_field(baked, cfg: NGPConfig, bcfg: BakedConfig, x,
                compute_dtype=jnp.bfloat16):
    """x: (N, 3) world -> (sigmas (N,), h (N, F)) via 2 gather rows/sample.
    Samples in empty blocks return sigma=0."""
    V, Bk = bcfg.voxel_res, bcfg.block
    Gb = bcfg.block_res
    s = baked_extent(cfg)
    F = bcfg.feat_dim

    pos = jnp.clip((x / s * 0.5 + 0.5), 0.0, 1.0 - 1e-6) * V  # voxel coords
    v0 = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - v0.astype(pos.dtype)).astype(compute_dtype)

    b = v0 // Bk
    bid = (b[:, 0] * Gb + b[:, 1]) * Gb + b[:, 2]
    pb = jnp.take(baked["block_map"], bid)                    # gather 1
    local = v0 - b * Bk
    lid = (local[:, 0] * Bk + local[:, 1]) * Bk + local[:, 2]
    row_idx = jnp.where(pb >= 0, pb * (Bk ** 3) + lid, 0)
    rows = jnp.take(baked["pool"], row_idx, axis=0)           # gather 2
    rows = rows.astype(compute_dtype).reshape(-1, 8, F)

    w = trilerp_w8(frac)                                      # (N, 8)
    h = jnp.einsum("nc,ncf->nf", w, rows).astype(jnp.float32)
    sig = jnp.where(pb >= 0, trunc_exp(h[..., 0]), 0.0)
    return sig, h


def baked_apply(baked, cfg: NGPConfig, bcfg: BakedConfig, x, d):
    """Full baked field: (sigmas, rgbs) like ngp_apply."""
    sig, h = baked_field(baked, cfg, bcfg, x)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rgb_in = jnp.concatenate([sh_encode_deg4(d), h], axis=-1)
    logits = mlp_apply(baked["rgb_mlp"], rgb_in,
                       compute_dtype=jnp.bfloat16)
    return sig, jax.nn.sigmoid(logits)


_APPLY_CACHE = {}


def save_baked(path: str, baked, bcfg: BakedConfig):
    """Write the baked field as a single .npz deployment artifact — the
    serving analog of the reference's slim checkpoint (`ngp_pl/utils.py:
    28-38`): bake once on the training machine, serve anywhere without
    the training state.  ml_dtypes pools (bf16/fp8) round-trip through
    npz as raw bytes and are viewed back to their tagged dtype on load."""
    np.savez_compressed(
        path,
        block_map=np.asarray(baked["block_map"]),
        pool=np.asarray(baked["pool"]),
        pool_dtype=str(baked["pool"].dtype),
        n_blocks=int(baked["n_blocks"]),
        voxel_res=bcfg.voxel_res, block=bcfg.block, feat_dim=bcfg.feat_dim,
        **{f"rgb_mlp_{i}": np.asarray(w)
           for i, w in enumerate(baked["rgb_mlp"])})


def load_baked(path: str):
    """Load a save_baked artifact -> (baked dict, BakedConfig)."""
    z = np.load(path)
    dtype = np.dtype(str(z["pool_dtype"]))
    baked = dict(
        block_map=jnp.asarray(z["block_map"]),
        pool=jnp.asarray(z["pool"].view(dtype)),
        rgb_mlp=[jnp.asarray(z[f"rgb_mlp_{i}"])
                 for i in range(len([k for k in z.files
                                     if k.startswith("rgb_mlp_")]))],
        n_blocks=int(z["n_blocks"]),
    )
    bcfg = BakedConfig(voxel_res=int(z["voxel_res"]), block=int(z["block"]),
                       feat_dim=int(z["feat_dim"]), dtype=str(z["pool_dtype"]))
    return baked, bcfg


def make_baked_apply(bcfg: BakedConfig):
    """Cached apply_fn for render_test_fast (stable identity per bcfg, so
    the jitted renderer does not recompile every frame)."""
    fn = _APPLY_CACHE.get(bcfg)
    if fn is None:
        def fn(params, cfg, x, d, _bcfg=bcfg):
            return baked_apply(params, cfg, _bcfg, x, d)
        _APPLY_CACHE[bcfg] = fn
    return fn


def render_test_baked(baked, cfg: NGPConfig, occ_u8, rays_o, rays_d,
                      bcfg: BakedConfig = BakedConfig(), **kw):
    """Drop-in replacement for render_test_fast over the baked field."""
    from google_nerf_tpu.models.render_test_fast import render_test_fast
    return render_test_fast(baked, cfg, occ_u8, rays_o, rays_d,
                            apply_fn=make_baked_apply(bcfg), **kw)
