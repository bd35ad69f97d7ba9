"""Point-cloud -> scalar regression net for focal/shift refinement.

TPU-native equivalent of the reference SPVCNN classifier
(`Minist_Test/lib/spvcnn_classsification.py:1-160`, used by
`test_utils.refine_focal/refine_shift:112-131` to estimate the focal-length
scale and depth shift of a single-image reconstruction).

The reference uses torchsparse sparse 3D convolutions (GPU-native sparse
gather/scatter).  The TPU-native re-design rasterises the point cloud into
a fixed dense voxel grid (occupancy + mean normalised xyz per voxel) and
runs a small dense 3D CNN — dense convs are MXU-native, static-shape, and
the classifier operates at 64^3 where the dense grid is cheap (1MB).
Function class preserved: point cloud -> positive scalar.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def voxelize_points(points: jnp.ndarray, valid: jnp.ndarray,
                    grid: int = 64):
    """points: (N, 3); valid: (N,) bool -> (G, G, G, 4) features
    [occupancy, mean dx, mean dy, mean dz] over a normalised unit box."""
    pts = jnp.where(valid[:, None], points, 0.0)
    n_valid = jnp.maximum(valid.sum(), 1)
    center = pts.sum(0) / n_valid
    half = jnp.maximum(jnp.max(jnp.abs(pts - center), where=valid[:, None],
                               initial=1e-3), 1e-3)
    x01 = jnp.clip((points - center) / (2 * half) + 0.5, 0.0,
                   1.0 - 1e-6)
    ijk = (x01 * grid).astype(jnp.int32)
    flat = (ijk[:, 0] * grid + ijk[:, 1]) * grid + ijk[:, 2]
    flat = jnp.where(valid, flat, grid ** 3)  # dump invalid in a slop bin
    ones = valid.astype(jnp.float32)
    frac = x01 * grid - ijk.astype(jnp.float32) - 0.5
    cnt = jnp.zeros(grid ** 3 + 1).at[flat].add(ones)
    sums = jnp.zeros((grid ** 3 + 1, 3)).at[flat].add(
        frac * ones[:, None])
    cnt, sums = cnt[:-1], sums[:-1]
    occ = (cnt > 0).astype(jnp.float32)
    mean = sums / jnp.maximum(cnt, 1)[:, None]
    feat = jnp.concatenate([occ[:, None], mean], -1)
    return feat.reshape(grid, grid, grid, 4)


class VoxelConvBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3, 3), strides=self.stride,
                    padding=1, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.relu(x)


class VoxelResBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        h = VoxelConvBlock(self.features, self.stride)(x, train)
        h = nn.Conv(self.features, (3, 3, 3), padding=1, use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        if identity.shape[-1] != self.features or self.stride != 1:
            identity = nn.Conv(self.features, (1, 1, 1),
                               strides=self.stride, use_bias=False)(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9)(identity)
        return nn.relu(h + identity)


class VoxelNetRegressor(nn.Module):
    """Dense voxel classifier head: stem + 4 residual stages + GAP + MLP
    -> one positive scalar (the SPVCNN channel plan 32-32-64-128-256
    downscaled by `cr`)."""
    cr: float = 0.5
    out_positive: bool = True

    @nn.compact
    def __call__(self, vox, train: bool = False):
        cs = [int(self.cr * c) for c in (32, 32, 64, 128, 256)]
        x = VoxelConvBlock(cs[0])(vox[None] if vox.ndim == 4 else vox,
                                  train)
        for c in cs[1:]:
            x = VoxelResBlock(c, stride=2)(x, train)
        x = jnp.mean(x, axis=(1, 2, 3))           # global average pool
        x = nn.relu(nn.Dense(cs[-1] // 2)(x))
        x = nn.Dense(1)(x)
        return nn.softplus(x) if self.out_positive else x


def init_voxelnet(key, grid: int = 64, cr: float = 0.5):
    model = VoxelNetRegressor(cr=cr)
    vox = jnp.zeros((grid, grid, grid, 4))
    return model.init(key, vox)


def depth_to_pcd(depth: np.ndarray, focal: float):
    """(H, W) depth -> ((H*W, 3) points, (H*W,) valid) for the refiners
    (`test_utils.depth_to_pcd` semantics: invalid where depth <= 0)."""
    h, w = depth.shape
    u = np.arange(w) - w / 2.0
    v = np.arange(h) - h / 2.0
    x = depth * u[None, :] / focal
    y = depth * v[:, None] / focal
    pts = np.stack([x, y, depth], -1).reshape(-1, 3)
    return pts, (depth > 1e-8).reshape(-1)


def refine_shift(depth_wshift: np.ndarray, variables, focal: float,
                 max_shift: float = 0.7, steps: int = 1) -> float:
    """Iterative shift recovery (`test_utils.refine_shift:121-131`)."""
    model = VoxelNetRegressor(out_positive=False)
    d = np.array(depth_wshift)
    total = 0.0
    for _ in range(steps):
        pts, valid = depth_to_pcd(d, focal)
        vox = voxelize_points(jnp.asarray(pts), jnp.asarray(valid))
        shift = float(model.apply(variables, vox)[0, 0])
        shift = min(shift, max_shift)
        d = d - shift
        total += shift
    return total


def refine_focal(depth: np.ndarray, variables, focal: float,
                 steps: int = 1) -> float:
    """Iterative focal-scale recovery (`test_utils.refine_focal:112-119`).
    Returns the cumulative scale; refined focal = focal / scale."""
    model = VoxelNetRegressor(out_positive=True)
    f, scale_total = float(focal), 1.0
    for _ in range(steps):
        pts, valid = depth_to_pcd(depth, f)
        vox = voxelize_points(jnp.asarray(pts), jnp.asarray(valid))
        scale = float(model.apply(variables, vox)[0, 0])
        f = f / max(scale, 1e-3)
        scale_total *= scale
    return scale_total
