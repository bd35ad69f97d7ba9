"""Paired-level packed hash encoding — two resolution levels per table row.

Round-5 row-cutting redesign of the packed-corner encoder
(ops/packed_hash.py).  The v5e gather law is ROW-rate bound (~80-130M
rows/s, width nearly free up to fat serving rows — DESIGN_NOTES round 7 /
R4.6), and the flagship train step pays one gather row per (sample,
level): 8 rows/sample forward, and the same row count again through the
backward's two-sort payload gather.  This encoder halves the rows by
packing a PAIR of levels (parent resolution R, child resolution 2R) into
one row keyed by the PARENT cell:

  row = [ parent cell's 8 corners x F        (8F lanes)
          child 3x3x3 vertex grid  x F       (27F lanes) ]  = 35F floats

The child level's 2x2x2 sub-cells share vertices WITHIN the row (the
3^3 grid), so the child level is C0-continuous inside a parent cell and
discontinuous only at parent-cell faces — strictly smoother than the
packed encoder's per-cell corners at the same resolution.  The parent
level keeps the packed per-cell corner semantics.

Function class: instant-ngp multiresolution trainable grid (reference
tcnn HashGrid, `ngp_pl/models/networks.py:38-47`), same N_min..N_max
span with n_pairs*2 effective levels.  Dense pair tables use the parent
row-major cell index; finer pairs hash the PARENT cell coordinate with
the instant-ngp xor primes (ops/packed_hash._cell_keys — shared).

Why not the R4.7 Mosaic slab-DMA encoder: at the flagship budget
(57k samples/step) the Morton-sorted stream touches ~10-20k distinct
fine bricks, i.e. ~3-7 samples per brick — a 512-row slab DMA serving
<10 samples moves ~100x more bytes than the rows it replaces, and
shrinking the brick until the slab matches the sample count IS the row
gather.  Slab reuse needs the serving kernel's 64-rays-x-S-samples-per-
tile density, which a training batch never has.  Arithmetic recorded in
DESIGN_NOTES R5.1; this module is the rows/2 design that survives it.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.ops.packed_hash import (_cell_keys, _corner_weights,
                                             _corner_weight_grads,
                                             sorted_segment_rows)


@dataclasses.dataclass(frozen=True)
class PackedPairConfig:
    n_pairs: int = 4              # table count; effective levels = 2x
    n_features: int = 2           # features per level (out = 2*P*F)
    log2_table_size: int = 16     # parent cells per pair table
    base_resolution: int = 16     # coarsest PARENT resolution
    per_pair_scale: float = 3.17  # parent resolution ratio between pairs
    table_dtype: str = "bfloat16"  # gather dtype (params stay f32)

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def resolutions(self):
        """PARENT resolutions (P,) — the row key lattice.  Name matches
        PackedHashConfig so _cell_keys is shared."""
        return tuple(
            int(np.floor(self.base_resolution * self.per_pair_scale ** p))
            for p in range(self.n_pairs))

    @property
    def child_resolutions(self):
        return tuple(2 * r for r in self.resolutions)

    @property
    def all_resolutions(self):
        """The 2P effective levels, resolution-ascending per pair."""
        out = []
        for r in self.resolutions:
            out += [r, 2 * r]
        return tuple(out)

    @property
    def row_width(self) -> int:
        return 35 * self.n_features          # 8 parent + 27 child

    @property
    def out_dim(self) -> int:
        return 2 * self.n_pairs * self.n_features


def packed_pair_config_for_scale(scale: float, n_pairs: int = 4,
                                 max_resolution: int = 0,
                                 **kw) -> PackedPairConfig:
    """Same N_min..N_max span as the reference hash grid
    (`networks.py:29-31`: N_max = 2048*scale): the FINEST CHILD level
    lands at N_max, so parents span N_min .. N_max/2."""
    n_min = kw.pop("base_resolution", 16)
    n_max = max(max_resolution or 2048 * scale, 2 * n_min + 1)
    b = float(np.exp(np.log(n_max / 2.0 / n_min) / max(n_pairs - 1, 1)))
    return PackedPairConfig(n_pairs=n_pairs, base_resolution=n_min,
                            per_pair_scale=b, **kw)


def init_packed_pair(key, cfg: PackedPairConfig) -> jnp.ndarray:
    """(P, T, 35F) f32, U[-1e-4, 1e-4] (tcnn's init)."""
    return jax.random.uniform(
        key, (cfg.n_pairs, cfg.table_size, cfg.row_width), jnp.float32,
        minval=-1e-4, maxval=1e-4)


def _child_axis_weights(ci, ff):
    """Per-axis child-grid vertex weights.  ci: (..., 3) in {0., 1.}
    (which 2x2x2 sub-cell), ff: (..., 3) in [0, 1] (frac inside it).
    Returns u: (..., 3 axes, 3 vertices): the linear weight of child-grid
    vertex index v in {0, 1, 2} along each axis."""
    u0 = (1.0 - ci) * (1.0 - ff)
    u1 = (1.0 - ci) * ff + ci * (1.0 - ff)
    u2 = ci * ff
    return jnp.stack([u0, u1, u2], -1)


def _child_weights(ci, ff):
    """(..., 27) trilinear weights over the 3^3 child vertex grid;
    vertex (a, b, c) at index (a*3 + b)*3 + c (x outermost)."""
    u = _child_axis_weights(ci, ff)                          # (..., 3, 3)
    w = (u[..., 0, :, None, None] * u[..., 1, None, :, None]
         * u[..., 2, None, None, :])
    return w.reshape(w.shape[:-3] + (27,))


def _child_weight_grads(ci, ff):
    """d w27 / d ff_k: (..., 27, 3)."""
    u = _child_axis_weights(ci, ff)
    du = jnp.stack([-(1.0 - ci), (1.0 - ci) - ci, ci], -1)   # (..., 3, 3)
    grads = []
    for k in range(3):
        fac = [u[..., j, :] for j in range(3)]
        fac[k] = du[..., k, :]
        w = (fac[0][..., :, None, None] * fac[1][..., None, :, None]
             * fac[2][..., None, None, :])
        grads.append(w.reshape(w.shape[:-3] + (27,)))
    return jnp.stack(grads, -1)


def _pair_geometry(x, cfg: PackedPairConfig):
    """Shared forward/ref geometry: parent keys + both levels' weights."""
    keys, fp = _cell_keys(x, cfg)            # (P, N), (P, N, 3) parent
    ci = jnp.minimum(jnp.floor(fp * 2.0), 1.0)   # child sub-cell in {0,1}
    ff = fp * 2.0 - ci                           # frac inside it
    w8 = _corner_weights(fp)                     # (P, N, 8)
    w27 = _child_weights(ci, ff)                 # (P, N, 27)
    return keys, fp, ci, ff, w8, w27


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def packed_pair_encode(table, x, cfg: PackedPairConfig):
    """table: (P, T, 35F) f32; x: (N, 3) in [0, 1] -> (N, 2*P*F).

    Output feature order: [pair0 parent F, pair0 child F, pair1 parent F,
    ...] — resolution-ascending within each pair."""
    out, _ = _encode_fwd_impl(table, x, cfg)
    return out


def _encode_fwd_impl(table, x, cfg: PackedPairConfig):
    P, T, W = table.shape
    F = cfg.n_features
    n = x.shape[0]
    keys, fp, ci, ff, w8, w27 = _pair_geometry(x, cfg)
    gd = jnp.dtype(cfg.table_dtype)
    # one take per pair table: each table's working set stays in the fast
    # cache regime (see packed_hash._encode_fwd_impl measurement)
    rows = jnp.stack([jnp.take(table[p].astype(gd), keys[p], axis=0)
                      for p in range(P)]).astype(jnp.float32)  # (P, N, W)
    rp = rows[..., :8 * F].reshape(P, n, 8, F)
    rc = rows[..., 8 * F:].reshape(P, n, 27, F)
    feat_p = jnp.einsum("pnc,pncf->pnf", w8, rp)             # (P, N, F)
    feat_c = jnp.einsum("pnc,pncf->pnf", w27, rc)
    out = jnp.stack([feat_p, feat_c], axis=2)                # (P, N, 2, F)
    out = jnp.moveaxis(out, 1, 0).reshape(n, 2 * P * F)
    return out, (keys, fp, ci, ff, w8, w27, rp, rc)


def _fwd(table, x, cfg):
    out, res = _encode_fwd_impl(table, x, cfg)
    return out, res + (x.shape[0], table.shape)


def _bwd(cfg, res, g):
    keys, fp, ci, ff, w8, w27, rp, rc, n, tshape = res
    P, T, W = tshape
    F = cfg.n_features
    g = g.reshape(n, P, 2, F)
    gp = jnp.moveaxis(g[:, :, 0], 1, 0)                      # (P, N, F)
    gc = jnp.moveaxis(g[:, :, 1], 1, 0)

    # ---- dx (pose refinement): chain through both levels' fracs;
    # d ff / d fp = 2 (ci is piecewise constant) ----
    dw8 = _corner_weight_grads(fp)                           # (P, N, 8, 3)
    rg8 = jnp.einsum("pncf,pnf->pnc", rp, gp)
    dfp = jnp.einsum("pnc,pnck->pnk", rg8, dw8)              # (P, N, 3)
    dw27 = _child_weight_grads(ci, ff)                       # (P, N, 27, 3)
    rg27 = jnp.einsum("pncf,pnf->pnc", rc, gc)
    dff = jnp.einsum("pnc,pnck->pnk", rg27, dw27)
    resv = jnp.asarray(cfg.resolutions, jnp.float32)
    dx = jnp.sum((dfp + 2.0 * dff) * resv[:, None, None], axis=0)

    # ---- dtable: ONE two-sort segment-sum over P lanes (vs the packed
    # encoder's 2P) with a 35F-wide payload — the rows/2 trade the v5e
    # gather law prices in this design's favor ----
    payload_src = jnp.concatenate([
        (w8[..., :, None] * gp[..., None, :]).reshape(P, n, 8 * F),
        (w27[..., :, None] * gc[..., None, :]).reshape(P, n, 27 * F),
    ], axis=-1)                                              # (P, N, 35F)
    dtab = sorted_segment_rows(keys, payload_src, T)
    return dtab, dx


packed_pair_encode.defvjp(_fwd, _bwd)


def packed_pair_encode_ref(table, x, cfg: PackedPairConfig):
    """Plain differentiable restatement (no custom VJP, no dtype tricks)
    for golden + gradient tests."""
    P, T, W = table.shape
    F = cfg.n_features
    n = x.shape[0]
    keys, fp, ci, ff, w8, w27 = _pair_geometry(x, cfg)
    outs = []
    for p in range(P):
        rows = table[p][keys[p]]                             # (N, 35F)
        rp = rows[:, :8 * F].reshape(n, 8, F)
        rc = rows[:, 8 * F:].reshape(n, 27, F)
        outs.append(jnp.einsum("nc,ncf->nf", w8[p], rp))
        outs.append(jnp.einsum("nc,ncf->nf", w27[p], rc))
    return jnp.stack(outs, 1).reshape(n, 2 * P * F)
