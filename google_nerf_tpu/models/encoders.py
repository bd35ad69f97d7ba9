"""Input encodings: frequency, spherical harmonics, multiresolution hash grid.

TPU-native equivalents of the tinycudann encodings consumed by the reference
(`ngp_pl/models/networks.py:34-70`):
  * Frequency (12 sin/cos bands) — the fork's current xyz encoder config
  * SphericalHarmonics degree 4 — direction encoder
  * HashGrid L=16, F=2, T=2^19, N_min=16, b=exp(ln(2048*scale/16)/(L-1)) —
    the commented-out Instant-NGP performance path (`networks.py:38-47`)

All are fresh JAX implementations trained from scratch (no weight porting is
needed for NGP), so we match the *function class*, not tcnn's exact layouts.
The hash encode runs per-level bf16 gathers + trilinear interpolation over
the (L, T, F) table; gradients reach the table through the zero-scatter
batched sort backward (ops/table_gather.batched_table_gather).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.ops.table_gather import (batched_table_gather,
                                              table_gather)  # noqa: F401
# (table_gather re-exported: external users treat this module as the
# encoder-op surface)

# ---------------------------------------------------------------------------
# Frequency encoding
# ---------------------------------------------------------------------------


def frequency_encode(x: jnp.ndarray, n_freqs: int = 12) -> jnp.ndarray:
    """NeRF positional encoding. x: (..., D) -> (..., D*2*n_freqs).

    Bands are 2^i * pi for i in [0, n_freqs) applied to the raw input
    (which the NGP model feeds in [0, 1])."""
    freqs = (2.0 ** jnp.arange(n_freqs, dtype=x.dtype)) * jnp.pi
    ang = x[..., None] * freqs  # (..., D, F)
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return enc.reshape(*x.shape[:-1], x.shape[-1] * 2 * n_freqs)


# ---------------------------------------------------------------------------
# Spherical harmonics degree 4 (16 components), hard-coded real basis.
# Same basis as instant-ngp's SH encoder; input must be unit directions.
# ---------------------------------------------------------------------------


def sh_encode_deg4(d: jnp.ndarray) -> jnp.ndarray:
    """d: (..., 3) unit directions -> (..., 16) SH basis values."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    comps = [
        jnp.full_like(x, 0.28209479177387814),              # l=0
        -0.48860251190291987 * y,                           # l=1
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,                            # l=2
        -1.0925484305920792 * yz,
        0.94617469575755997 * zz - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * (xx - yy),
        0.59004358992664352 * y * (-3.0 * xx + yy),          # l=3
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * zz),
        0.3731763325901154 * z * (5.0 * zz - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * zz),
        1.4453057213202769 * z * (xx - yy),
        0.59004358992664352 * x * (-xx + 3.0 * yy),
    ]
    return jnp.stack(comps, axis=-1)


# ---------------------------------------------------------------------------
# Multiresolution hash grid
# ---------------------------------------------------------------------------

_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.3819  # exp(ln(2048*scale/16)/(L-1)), scale=.5
    table_dtype: str = "bfloat16"    # gather dtype (params stay f32)

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def resolutions(self):
        return tuple(
            int(np.floor(self.base_resolution * self.per_level_scale ** l))
            for l in range(self.n_levels))

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features


def hashgrid_config_for_scale(scale: float, num_levels: int = 16,
                              **kw) -> HashGridConfig:
    """Reference parameterisation (`networks.py:29-31`):
    b = exp(ln(2048*scale/N_min)/(L-1))."""
    n_min = kw.pop("base_resolution", 16)
    b = float(np.exp(np.log(2048 * scale / n_min) / (num_levels - 1)))
    return HashGridConfig(n_levels=num_levels, base_resolution=n_min,
                          per_level_scale=b, **kw)


def init_hashgrid(key, cfg: HashGridConfig, dtype=jnp.float32) -> jnp.ndarray:
    """(L, T, F) table, uniform in [-1e-4, 1e-4] (tcnn's init)."""
    return jax.random.uniform(
        key, (cfg.n_levels, cfg.table_size, cfg.n_features), dtype,
        minval=-1e-4, maxval=1e-4)


def _corner_indices(c, level_dense, resolutions, T):
    """c: (L, N, 3) int corner coords. Returns (L, N) table index per level."""
    res1 = (resolutions + 1)[:, None]  # (L, 1)
    dense_idx = (c[..., 0]
                 + c[..., 1] * res1
                 + c[..., 2] * res1 * res1)
    cu = c.astype(jnp.uint32)  # primes exceed int32: hash in uint32
    h = ((cu[..., 0] * jnp.uint32(_PRIMES[0]))
         ^ (cu[..., 1] * jnp.uint32(_PRIMES[1]))
         ^ (cu[..., 2] * jnp.uint32(_PRIMES[2]))) & jnp.uint32(T - 1)
    idx = jnp.where(level_dense[:, None], dense_idx, h.astype(jnp.int32))
    return jnp.clip(idx, 0, T - 1)


@partial(jax.jit, static_argnames=("cfg",))
def hash_encode(table: jnp.ndarray, x: jnp.ndarray,
                cfg: HashGridConfig) -> jnp.ndarray:
    """table: (L, T, F); x: (N, 3) in [0, 1] -> (N, L*F) features.

    Per level: scale x by the level resolution, trilinearly interpolate the 8
    surrounding vertices.  Levels whose dense vertex count (res+1)^3 fits in T
    are indexed densely; larger levels use the instant-ngp xor-prime hash.

    Row traffic rides `ops.table_gather.batched_table_gather`: per-level
    bf16 takes forward (small per-level working sets — the fast gather
    regime) and ONE batched (L, 8N+T) fused-single-key sort backward with
    zero scatters, the same pipeline the packed flagship encoder uses
    (ops/packed_hash.py; VERDICT r1 item 3).
    """
    L, T, F = table.shape
    resolutions = jnp.asarray(cfg.resolutions, jnp.int32)  # (L,)
    level_dense = jnp.asarray(
        [(r + 1) ** 3 <= cfg.table_size for r in cfg.resolutions])

    pos = x[None, :, :] * resolutions[:, None, None].astype(x.dtype)  # (L,N,3)
    c0 = jnp.clip(jnp.floor(pos), 0, (resolutions[:, None, None] - 1)
                  .astype(x.dtype)).astype(jnp.int32)
    frac = pos - c0.astype(x.dtype)

    idxs, ws = [], []
    for corner in range(8):
        offs = jnp.asarray([(corner >> k) & 1 for k in range(3)], jnp.int32)
        c = c0 + offs[None, None, :]
        ws.append(jnp.prod(
            jnp.where(offs[None, None, :] == 1, frac, 1.0 - frac), axis=-1))
        idxs.append(_corner_indices(c, level_dense, resolutions, T))
    all_idx = jnp.stack(idxs, axis=1).reshape(L, 8 * x.shape[0])  # (L, 8N)
    w = jnp.stack(ws)                                             # (8, L, N)
    feats = batched_table_gather(table, all_idx, cfg.table_dtype) \
        .reshape(L, 8, x.shape[0], F)
    out = jnp.einsum("cln,lcnf->lnf", w, feats)
    return jnp.moveaxis(out, 0, 1).reshape(x.shape[0], L * F)
