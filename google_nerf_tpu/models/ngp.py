"""The NGP radiance-field model (functional, pytree params).

TPU-native rebuild of reference `ngp_pl/models/networks.py:12-117` (class NGP):
  * scene box [-scale, scale]^3, cascades = max(1 + ceil(log2(2*scale)), 1)
  * xyz encoder: HashGrid (performance path, `networks.py:38-47`) or
    Frequency-12 (the fork's current config, `networks.py:48-53`) followed by
    a 64-wide 1-hidden-layer sigma MLP with 16 outputs
  * direction encoder: spherical harmonics degree 4 (`networks.py:63-70`)
  * rgb net: 32 -> 64 -> 64 -> 3 with sigmoid (`networks.py:72-83`)
  * sigma activation: TruncExp on feature channel 0 (`networks.py:85,96-98`)

Occupancy-grid *state* (density grid / bitfield) lives in the TrainState, not
here — the model is a pure function of (params, x, d).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.models.encoders import (HashGridConfig, frequency_encode,
                                             hash_encode,
                                             hashgrid_config_for_scale,
                                             init_hashgrid, sh_encode_deg4)
from google_nerf_tpu.ops.packed_hash import (PackedHashConfig,
                                             init_packed_hash,
                                             packed_config_for_scale,
                                             packed_hash_encode)
from google_nerf_tpu.ops.packed_pair import (PackedPairConfig,
                                             init_packed_pair,
                                             packed_pair_config_for_scale,
                                             packed_pair_encode)
from google_nerf_tpu.models.mlp import init_mlp, mlp_apply
from google_nerf_tpu.ops.trunc_exp import trunc_exp


@dataclasses.dataclass(frozen=True)
class NGPConfig:
    scale: float = 0.5
    encoder: str = "hash"            # "hash" | "freq" | "packed"
    num_levels: int = 16             # hash levels (opt.py:51 --num_levels)
    n_features: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    n_freqs: int = 12                # frequency-encoder bands
    # "packed" = packed-corner hash (ops/packed_hash.py): one gather per
    # (sample, level), sort-based backward.  "packed2" = paired-level
    # rows (ops/packed_pair.py): one gather per (sample, LEVEL PAIR) —
    # half the rows at the same effective level count (the flagship
    # round-5 row-cut; gathers are row-rate bound on v5e)
    packed_levels: int = 8
    packed_features: int = 2
    packed_log2_size: int = 16
    packed_max_res: int = 0          # 0 = reference N_max (2048*scale)
    packed_table_dtype: str = "bfloat16"  # gather dtype: fat-row gathers
                                     # are byte-bound (ops/pallas notes), so
                                     # a narrower dtype speeds the encoder;
                                     # params/grads stay f32 regardless
    grid_size: int = 128
    sigma_width: int = 64
    geo_feat_dim: int = 16
    rgb_width: int = 64
    rgb_layers: int = 2
    compute_dtype: Any = jnp.float32

    @property
    def cascades(self) -> int:
        return max(1 + int(np.ceil(np.log2(2 * self.scale))), 1)

    @property
    def hash_cfg(self) -> HashGridConfig:
        return hashgrid_config_for_scale(
            self.scale, num_levels=self.num_levels,
            n_features=self.n_features,
            log2_hashmap_size=self.log2_hashmap_size,
            base_resolution=self.base_resolution)

    @property
    def packed_cfg(self) -> PackedHashConfig:
        return packed_config_for_scale(
            self.scale, n_levels=self.packed_levels,
            n_features=self.packed_features,
            log2_table_size=self.packed_log2_size,
            max_resolution=self.packed_max_res,
            table_dtype=self.packed_table_dtype)

    @property
    def pair_cfg(self) -> PackedPairConfig:
        # packed_levels effective levels = packed_levels // 2 pair tables
        return packed_pair_config_for_scale(
            self.scale, n_pairs=max(self.packed_levels // 2, 1),
            n_features=self.packed_features,
            log2_table_size=self.packed_log2_size,
            max_resolution=self.packed_max_res,
            table_dtype=self.packed_table_dtype)

    @property
    def xyz_feat_dim(self) -> int:
        if self.encoder == "hash":
            return self.hash_cfg.out_dim
        if self.encoder == "packed":
            return self.packed_cfg.out_dim
        if self.encoder == "packed2":
            return self.pair_cfg.out_dim
        return 3 * 2 * self.n_freqs


def init_ngp(key, cfg: NGPConfig) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    params: Dict[str, Any] = {}
    if cfg.encoder == "hash":
        params["hash_table"] = init_hashgrid(k1, cfg.hash_cfg)
    elif cfg.encoder == "packed":
        params["packed_table"] = init_packed_hash(k1, cfg.packed_cfg)
    elif cfg.encoder == "packed2":
        params["pair_table"] = init_packed_pair(k1, cfg.pair_cfg)
    elif cfg.encoder != "freq":
        raise ValueError(f"unknown encoder {cfg.encoder!r}")
    params["sigma_mlp"] = init_mlp(
        k2, [cfg.xyz_feat_dim, cfg.sigma_width, cfg.geo_feat_dim])
    params["rgb_mlp"] = init_mlp(
        k3, [16 + cfg.geo_feat_dim]
        + [cfg.rgb_width] * cfg.rgb_layers + [3])
    return params


def _encode_xyz(params, cfg: NGPConfig, x01):
    if cfg.encoder == "hash":
        return hash_encode(params["hash_table"], x01, cfg.hash_cfg)
    if cfg.encoder == "packed":
        return packed_hash_encode(params["packed_table"], x01,
                                  cfg.packed_cfg)
    if cfg.encoder == "packed2":
        return packed_pair_encode(params["pair_table"], x01,
                                  cfg.pair_cfg)
    return frequency_encode(x01, cfg.n_freqs)


def ngp_density(params, cfg: NGPConfig, x, return_feat: bool = False):
    """x: (N, 3) world coords in [-scale, scale] -> sigmas (N,)
    (+ geometric features (N, geo_feat_dim) if return_feat)."""
    x01 = (x + cfg.scale) / (2 * cfg.scale)
    enc = _encode_xyz(params, cfg, x01)
    h = mlp_apply(params["sigma_mlp"], enc, compute_dtype=cfg.compute_dtype)
    sigmas = trunc_exp(h[..., 0])
    if return_feat:
        return sigmas, h
    return sigmas


def ngp_apply(params, cfg: NGPConfig, x, d):
    """x, d: (N, 3) positions and (not necessarily unit) view directions.
    Returns sigmas (N,), rgbs (N, 3)."""
    sigmas, h = ngp_density(params, cfg, x, return_feat=True)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    d_enc = sh_encode_deg4(d)
    rgb_in = jnp.concatenate([d_enc, h], axis=-1)
    logits = mlp_apply(params["rgb_mlp"], rgb_in,
                       compute_dtype=cfg.compute_dtype)
    return sigmas, jax.nn.sigmoid(logits)
