"""Per-frame pre-shaded RGBA pool — the no-MLP serving field.

The kernel-cost probe (DESIGN_NOTES R4.1) measured the MXU brick
renderer's wall as per-slot slab traffic + body time; the 128-lane
feature slabs and the in-kernel rgb MLP are most of both.  This module
evaluates the rgb MLP ONCE PER VOXEL-CORNER PER FRAME — with each grid
point's exact view direction (camera origin -> point), so view-dependent
color is preserved up to the direction variation across a single voxel
(< the pixel footprint at typical distances) — and packs per-corner
[log-sigma, r, g, b] into (n_blocks, 32, vox) slabs: 4x fewer slab
bytes, no MLP / sh work in the kernel body.

Approximation vs the live field: the live renderer computes
MLP(trilerp(h)); this path computes trilerp(MLP(h)) — the SNeRG-class
baked-shading tradeoff, measured on the procedural protocol
(tools/fps_mxu2.py psnr-vs-gt column).  The bake is per-frame (per
camera origin) and its cost is part of every reported frame time.

Corner dedup: pool rows replicate each shared corner 8x; the MLP runs
on the (Bk+1)^3 corner GRID instead (5.6x fewer evals), rebuilt from
the rows by pure slicing (shared copies are identical by construction,
models/baked.py bake()).

Reference analog: SNeRG/instant-ngp-style baked serving; the reference
repo itself serves via CUDA-speed gathers (`ngp_pl/test.py:30-45`).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.models.baked import BakedConfig, baked_extent
from google_nerf_tpu.models.encoders import sh_encode_deg4
from google_nerf_tpu.models.mlp import mlp_apply
from google_nerf_tpu.models.ngp import NGPConfig


def _corner_grid(pool_rows, Bk, F):
    """(nb, Bk^3, 8F) corner-replicated rows -> (nb, Bk+1, Bk+1, Bk+1, F)
    corner grid (any replica represents its shared corner)."""
    nb = pool_rows.shape[0]
    # corner index c = cx + 2 cy + 4 cz (x = LSB, baked.trilerp_w8):
    # reshaping the 8-corner axis to (2, 2, 2) yields axes (cz, cy, cx)
    p = pool_rows.reshape(nb, Bk, Bk, Bk, 2, 2, 2, F)
    gx = jnp.concatenate([p[:, :, :, :, :, :, 0, :],
                          p[:, Bk - 1:, :, :, :, :, 1, :]], axis=1)
    gy = jnp.concatenate([gx[:, :, :, :, :, 0, :],
                          gx[:, :, Bk - 1:, :, :, 1, :]], axis=2)
    gz = jnp.concatenate([gy[:, :, :, :, 0, :],
                          gy[:, :, :, Bk - 1:, 1, :]], axis=3)
    return gz                     # (nb, Bk+1, Bk+1, Bk+1, F)


def _rows_from_grid(G, Bk):
    """(nb, Bk+1, Bk+1, Bk+1, C) -> (nb, Bk^3, 8, C) per-voxel corner
    rows (the bake() slicing pattern; corner c bit k = offset on axis k,
    x = LSB)."""
    nb, C = G.shape[0], G.shape[-1]
    rows = jnp.stack([
        G[:, ox:ox + Bk, oy:oy + Bk, oz:oz + Bk]
        for c in range(8)
        for ox, oy, oz in [((c >> 0) & 1, (c >> 1) & 1, (c >> 2) & 1)]
    ], axis=4)
    return rows.reshape(nb, Bk ** 3, 8, C)


@partial(jax.jit, static_argnames=("Bk", "F", "V", "s", "out_dtype"))
def _bake_rgba_chunk(pool_rows, origins, rgb_mlp, cam_o, *, Bk, F, V, s,
                     out_dtype):
    """pool_rows: (nb, Bk^3, 8F) any float dtype (kept NATIVE — casting
    the whole pool to f32 doubled+ HBM and OOM'd at 25k blocks);
    origins: (nb, 3) int32 voxel coords of each block's min corner
    -> (nb, 32, Bk^3) pre-shaded slabs."""
    nb = pool_rows.shape[0]
    G = _corner_grid(pool_rows, Bk, F)           # (nb, 9, 9, 9, F)
    n_cg = (Bk + 1) ** 3
    h = G.reshape(nb, n_cg, F).astype(jnp.bfloat16)
    cg = jnp.stack(jnp.meshgrid(*([jnp.arange(Bk + 1)] * 3),
                                indexing="ij"), -1).reshape(-1, 3)
    pts = origins[:, None, :] + cg[None]         # (nb, n_cg, 3) grid pts
    xyz = (pts.astype(jnp.float32) / V * 2.0 - 1.0) * s
    d = xyz - cam_o[None, None, :]
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    sh = sh_encode_deg4(d.reshape(-1, 3)).astype(jnp.bfloat16)
    rgb_in = jnp.concatenate([sh, h.reshape(-1, F)], axis=-1)
    logits = mlp_apply(rgb_mlp, rgb_in, compute_dtype=jnp.bfloat16)
    rgb = jax.nn.sigmoid(logits).reshape(nb, n_cg, 3)
    rgba_g = jnp.concatenate([h[..., 0:1].astype(rgb.dtype), rgb],
                             axis=-1)                       # (nb,n_cg,4)
    rows = _rows_from_grid(
        rgba_g.reshape(nb, Bk + 1, Bk + 1, Bk + 1, 4), Bk)  # (nb,v,8,4)
    vox = Bk ** 3
    return jnp.swapaxes(rows.reshape(nb, vox, 32), 1, 2) \
        .astype(jnp.dtype(out_dtype))            # (nb, 32, vox)


def bake_rgba(baked, cfg: NGPConfig, bcfg: BakedConfig, cam_o,
              dtype: str = "bfloat16", chunk_blocks: int = 4096):
    """Pre-shade the baked pool for one camera origin.

    Returns (n_blocks, 32, Bk^3) slabs for brick_field_tiles_rgba; run
    once per frame (the cost is part of the frame time — report it)."""
    Bk, V, F = bcfg.block, bcfg.voxel_res, bcfg.feat_dim
    nb = int(baked["n_blocks"])
    bm = np.asarray(baked["block_map"])
    Gb = bcfg.block_res
    blk_ids = np.argsort(bm, kind="stable")[-nb:]     # pool-index order
    bx = blk_ids // (Gb * Gb)
    by = (blk_ids // Gb) % Gb
    bz = blk_ids % Gb
    origins = jnp.asarray(
        np.stack([bx, by, bz], -1).astype(np.int32) * Bk)   # (nb, 3)
    rpb = Bk ** 3
    pool = baked["pool"]                 # (nb*rpb, 8F), NATIVE dtype
    cam_o = jnp.asarray(cam_o, jnp.float32).reshape(3)
    s = baked_extent(cfg)
    parts = []
    step = min(chunk_blocks, nb)
    for i in range(0, nb, step):
        n = min(step, nb - i)
        chunk = pool[i * rpb:(i + n) * rpb].reshape(n, rpb, 8 * F)
        org = origins[i:i + n]
        if n < step:                     # pad the LAST chunk only (reuse
            chunk = jnp.concatenate(     # the compiled program)
                [chunk, jnp.zeros((step - n,) + chunk.shape[1:],
                                  chunk.dtype)])
            org = jnp.concatenate(
                [org, jnp.zeros((step - n, 3), jnp.int32)])
        parts.append(_bake_rgba_chunk(
            chunk, org, tuple(baked["rgb_mlp"]), cam_o, Bk=Bk, F=F, V=V,
            s=float(s), out_dtype=dtype))
    out = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return out[:nb]


def render_brick_mxu_rgba(baked, cfg: NGPConfig, rays_o, rays_d, W, H, *,
                          bcfg: BakedConfig, cam_o=None,
                          rgba_dtype: str = "bfloat16", **kw):
    """Pre-shade for this frame's camera origin, then render with the
    RGBA kernel.  The bake runs inside the frame (its time is part of any
    FPS measurement).  cam_o defaults to rays_o[0] (pinhole)."""
    from google_nerf_tpu.models.render_brick_mxu import render_brick_mxu
    if cam_o is None:
        cam_o = jnp.asarray(rays_o)[0]
    baked["poolRGBA"] = bake_rgba(baked, cfg, bcfg, cam_o,
                                  dtype=rgba_dtype)
    return render_brick_mxu(baked, cfg, rays_o, rays_d, W, H, bcfg=bcfg,
                            kernel="rgba", **kw)
