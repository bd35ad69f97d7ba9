"""Packed-corner multiresolution hash encoding — the TPU-native flagship
xyz encoder.

Function class: instant-ngp style multiresolution trainable grid (reference
tcnn HashGrid, `ngp_pl/models/networks.py:38-47`), re-laid-out for the TPU
memory system.  Measured v5e rates (tools/sanity_bench.py, microbench3.py):

    XLA row gather   ~110-160 M rows/s (row-count bound, width ~free)
    XLA scatter-add  ~16 M rows/s (duplicates) / ~8 M rows/s (unique)
    lax.sort         ~100-300 M rows/s
    Pallas           no vector gather / no vector scatter on this target

So the layout packs ALL 8 trilinear corners of a cell into ONE table row
(`(T, 8*F)`), making the forward ONE gather per (sample, level) — 8x fewer
gathers than the vertex-shared layout — and the backward a pure
sort + cumsum + marker-merge pipeline with ZERO scatters:

  1. key = level*T + cell_index for each (sample, level)      (N*L rows)
  2. one ascending sort of [contribution keys ++ one marker per table row],
     markers ordered after contributions of the same key
  3. masked cumulative sum of the (w x g) outer-product payloads
  4. the cumsum value standing at each marker is the running total A_t of
     everything up to and including key t; the per-row gradient is the
     consecutive difference A_t - A_{t-1}
  5. markers are extracted in key order with one more (key, position) sort

Trade-off vs tcnn: corners are per-cell (not shared between neighbouring
cells), so each level is bilinear inside a cell but C0-discontinuous at
cell faces — the same kind of artifact hash collisions already introduce;
the L-level sum + MLP smooths it (validated by the e2e convergence test).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class PackedHashConfig:
    n_levels: int = 8
    n_features: int = 2           # features per corner (output dim = L*F)
    log2_table_size: int = 16     # cells per level
    base_resolution: int = 16
    per_level_scale: float = 2.0  # set via packed_config_for_scale
    table_dtype: str = "bfloat16"  # gather dtype (params stay f32)

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def resolutions(self):
        return tuple(
            int(np.floor(self.base_resolution * self.per_level_scale ** l))
            for l in range(self.n_levels))

    @property
    def row_width(self) -> int:
        return 8 * self.n_features

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def packed_config_for_scale(scale: float, n_levels: int = 8,
                            max_resolution: int = 0,
                            **kw) -> PackedHashConfig:
    """Same N_min..N_max span as the reference hash grid
    (`networks.py:29-31`: N_max = 2048*scale), fewer/fatter levels.
    `max_resolution` overrides N_max (cap the finest level to the content/
    image bandwidth — unconstrained fine levels destabilize training on
    low-frequency content, see DESIGN_NOTES.md)."""
    n_min = kw.pop("base_resolution", 16)
    n_max = max(max_resolution or 2048 * scale, n_min + 1)
    b = float(np.exp(np.log(n_max / n_min) / max(n_levels - 1, 1)))
    return PackedHashConfig(n_levels=n_levels, base_resolution=n_min,
                            per_level_scale=b, **kw)


def init_packed_hash(key, cfg: PackedHashConfig) -> jnp.ndarray:
    """(L, T, 8F) f32, U[-1e-4, 1e-4] (tcnn's init)."""
    return jax.random.uniform(
        key, (cfg.n_levels, cfg.table_size, cfg.row_width), jnp.float32,
        minval=-1e-4, maxval=1e-4)


def _cell_keys(x, cfg: PackedHashConfig):
    """x: (N, 3) in [0,1] -> keys (L, N) int32 in [0, T), frac (L, N, 3).

    Dense levels (res^3 <= T) use the row-major cell index; finer levels the
    instant-ngp xor-prime hash of the CELL coordinate."""
    res = jnp.asarray(cfg.resolutions, jnp.int32)            # (L,)
    T = cfg.table_size
    dense = jnp.asarray([r ** 3 <= T for r in cfg.resolutions])
    pos = x[None] * res[:, None, None].astype(x.dtype)       # (L, N, 3)
    c0 = jnp.clip(jnp.floor(pos), 0,
                  (res[:, None, None] - 1).astype(x.dtype)).astype(jnp.int32)
    frac = pos - c0.astype(x.dtype)
    dense_idx = (c0[..., 0] * res[:, None] + c0[..., 1]) * res[:, None] \
        + c0[..., 2]
    cu = c0.astype(jnp.uint32)
    h = ((cu[..., 0] * jnp.uint32(_PRIMES[0]))
         ^ (cu[..., 1] * jnp.uint32(_PRIMES[1]))
         ^ (cu[..., 2] * jnp.uint32(_PRIMES[2]))) & jnp.uint32(T - 1)
    idx = jnp.where(dense[:, None], dense_idx, h.astype(jnp.int32))
    return jnp.clip(idx, 0, T - 1), frac


def _corner_weights(frac):
    """frac: (..., 3) -> (..., 8) trilinear weights; corner c uses offset
    bit k = (c >> k) & 1 on dim k."""
    f = frac[..., None, :]                                   # (..., 1, 3)
    offs = jnp.asarray([[(c >> k) & 1 for k in range(3)]
                        for c in range(8)], frac.dtype)      # (8, 3)
    w = jnp.where(offs == 1, f, 1.0 - f)                     # (..., 8, 3)
    return w[..., 0] * w[..., 1] * w[..., 2]


def _corner_weight_grads(frac):
    """d w_c / d frac_k: (..., 8, 3)."""
    f = frac[..., None, :]
    offs = jnp.asarray([[(c >> k) & 1 for c2 in [c] for k in range(3)]
                        for c in range(8)], frac.dtype)
    term = jnp.where(offs == 1, f, 1.0 - f)                  # (..., 8, 3)
    sign = jnp.where(offs == 1, 1.0, -1.0)
    grads = []
    for k in range(3):
        others = [term[..., j] for j in range(3) if j != k]
        grads.append(sign[..., k] * others[0] * others[1])
    return jnp.stack(grads, -1)                              # (..., 8, 3)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def packed_hash_encode(table, x, cfg: PackedHashConfig):
    """table: (L, T, 8F) f32; x: (N, 3) in [0, 1] -> (N, L*F)."""
    out, _ = _encode_fwd_impl(table, x, cfg)
    return out


def _encode_fwd_impl(table, x, cfg: PackedHashConfig):
    L, T, W = table.shape
    F = cfg.n_features
    keys, frac = _cell_keys(x, cfg)                          # (L,N),(L,N,3)
    gd = jnp.dtype(cfg.table_dtype)
    # One take PER LEVEL instead of one take over the (L*T, W) concat:
    # each level's working set (2 MiB at T=2^16 bf16) rides the fast
    # cache regime — 6.25 ms vs 20.1 ms for the 16 MiB single take at
    # flagship shapes (tools/microbench_encoder_bwd3.py, v5e, chained
    # fetch-synchronised timing).
    rows = jnp.stack([jnp.take(table[l].astype(gd), keys[l], axis=0)
                      for l in range(L)])                    # (L, N, W)
    rows = rows.reshape(L, x.shape[0], 8, F).astype(jnp.float32)
    w = _corner_weights(frac)                                # (L, N, 8)
    feat = jnp.einsum("lnc,lncf->lnf", w, rows)
    out = jnp.moveaxis(feat, 0, 1).reshape(x.shape[0], L * F)
    return out, (keys, frac, rows, w)


def _fwd(table, x, cfg):
    out, res = _encode_fwd_impl(table, x, cfg)
    return out, res + (x.shape[0], table.shape)


def sorted_segment_rows(keys, payload_src, T: int):
    """Zero-scatter segment-sum: sum payload rows by key, per lane.

    keys: (L, N) int32 in [0, T); payload_src: (L, N, W) f32.  Returns
    (L, T, W) where out[l, t] = sum over {n: keys[l, n] == t} of
    payload_src[l, n] — the table-gradient reduction, shared by the
    packed (per-level) and packed-pair (per-pair) encoder backwards.

    Batched per-lane sort + cumsum + marker merge: lanes are independent
    segment-sums, so sort (L, N+T) batched along the last axis instead
    of one flat (L*(N+T),) sort — XLA vectorizes the L lanes, each
    lane's working set is L x smaller, and the comparator runs log(N+T)
    instead of log(L*(N+T)) rounds.  Measured 19.0 ms vs 44.8 ms flat
    at flagship shapes (tools/microbench_encoder_bwd3.py, chained
    fetch-synced timing).  The sort key is FUSED (cell_key*2 |
    is_marker) so the comparator runs on ONE int32 key (position rides
    along as a value operand), and the payload is materialized ONCE at
    source order so the sorted-order payload costs ONE (L, N+T)-row
    gather instead of two — gather rows are the backward's wall (v5e
    gather law, DESIGN_NOTES.md).  This two-sort pipeline IS the XLA
    floor: bisect-based variants lose 4-5x (DESIGN_NOTES R4.1).
    """
    L, n = keys.shape
    W = payload_src.shape[-1]
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (L, n))
    marker_k = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (L, T))
    k_all = jnp.concatenate(
        [keys * 2, marker_k * 2 + 1], axis=1)                # (L, N+T)
    p_all = jnp.concatenate(
        [pos, jnp.full((L, T), n, jnp.int32)], axis=1)
    ks, ps = jax.lax.sort((k_all, p_all), dimension=1, num_keys=1)
    ks = ks >> 1

    is_contrib = ps < n                                      # (L, N+T)
    safe = jnp.where(is_contrib, ps, 0)
    payload = jnp.take_along_axis(payload_src, safe[..., None], axis=1)
    payload = jnp.where(is_contrib[..., None], payload, 0.0)
    csum = jnp.cumsum(payload, axis=1)                       # (L, N+T, W)

    # extract marker rows in key order: among markers keys are unique and
    # ascending, so sorting (marker? key : BIG, stream_pos) puts the T
    # markers first in each lane, ordered by key
    stream = jnp.broadcast_to(jnp.arange(n + T, dtype=jnp.int32), (L, n + T))
    mk = jnp.where(is_contrib, jnp.int32(T), ks)
    _, mrows = jax.lax.sort((mk, stream), dimension=1, num_keys=1)
    q = mrows[:, :T]                                         # (L, T)
    A = jnp.take_along_axis(csum, q[..., None], axis=1)      # (L, T, W)
    return jnp.diff(A, axis=1, prepend=jnp.zeros((L, 1, W), A.dtype))


def _bwd(cfg, res, g):
    keys, frac, rows, w, n, tshape = res
    L, T, W = tshape
    F = cfg.n_features
    gl = jnp.moveaxis(g.reshape(n, L, F), 1, 0)              # (L, N, F)

    # ---- dx (needed for pose refinement) ----
    dwdf = _corner_weight_grads(frac)                        # (L, N, 8, 3)
    # dout/dfrac = sum_c dw_c ⊗ rows_c·g
    rg = jnp.einsum("lncf,lnf->lnc", rows, gl)               # (L, N, 8)
    dfrac = jnp.einsum("lnc,lnck->lnk", rg, dwdf)            # (L, N, 3)
    resv = jnp.asarray(cfg.resolutions, jnp.float32)
    dx = jnp.sum(dfrac * resv[:, None, None], axis=0)        # (N, 3)

    # ---- dtable: batched per-level two-sort segment-sum ----
    payload_src = (w[..., :, None] * gl[..., None, :]).reshape(L, n, W)
    dtab = sorted_segment_rows(keys, payload_src, T)
    return dtab, dx


packed_hash_encode.defvjp(_fwd, _bwd)


def packed_hash_encode_ref(table, x, cfg: PackedHashConfig):
    """Naive per-corner reference (8 separate vertex... cell gathers) for
    testing the fused op — same math, no packing tricks."""
    L, T, W = table.shape
    F = cfg.n_features
    keys, frac = _cell_keys(x, cfg)
    w = _corner_weights(frac)                                # (L, N, 8)
    outs = []
    for l in range(L):
        rows = table[l][keys[l]]                             # (N, 8F)
        rows = rows.reshape(-1, 8, F)
        outs.append(jnp.einsum("nc,ncf->nf", w[l], rows))
    return jnp.concatenate(outs, axis=-1).reshape(x.shape[0], L * F) \
        if False else jnp.moveaxis(jnp.stack(outs), 0, 1).reshape(
            x.shape[0], L * F)
