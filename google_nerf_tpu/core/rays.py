"""Camera & ray math (pure jnp).

Semantics match the reference `ngp_pl/datasets/ray_utils.py` (see SURVEY.md §2.1):
  * get_ray_directions            ray_utils.py:8-47   (camera [right down front])
  * get_ray_directions_scannet    ray_utils.py:50-90  (identical math, no flips)
  * get_ray_directions_scannet_v2 ray_utils.py:93-133 (OpenGL: -y, -z)
  * get_rays                      ray_utils.py:137-175
  * axisangle_to_R                ray_utils.py:179-200
  * average_poses / center_poses  ray_utils.py:208-273
  * create_spheric_poses          ray_utils.py:276-311

All functions are fresh jnp implementations (no torch / kornia).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pixel_grid(H: int, W: int) -> jnp.ndarray:
    """(H, W, 2) grid of (u=col, v=row) pixel coordinates (no +0.5 offset).

    Equivalent of kornia.create_meshgrid(H, W, normalized_coordinates=False).
    """
    u = jnp.arange(W, dtype=jnp.float32)
    v = jnp.arange(H, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")  # each (H, W)
    return jnp.stack([uu, vv], axis=-1)


def get_ray_directions(H, W, K, *, convention: str = "rdf", random=False,
                       key=None, flatten=True, return_uv=False):
    """Per-pixel ray directions in camera coordinates.

    convention:
      'rdf' : [right down front]  (+z forward) — nsvf/colmap & scannet variants
      'rub' : [right up back]     (-y, -z)     — scannet_v2 / OpenGL
    Rays pass through pixel centers (u+0.5) unless `random`, in which case a
    uniform jitter inside the pixel is used (needs `key`).
    """
    K = jnp.asarray(K, jnp.float32)
    grid = pixel_grid(H, W)
    u, v = grid[..., 0], grid[..., 1]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    if random:
        ju = jax.random.uniform(key, u.shape)
        jv = jax.random.uniform(jax.random.fold_in(key, 1), v.shape)
    else:
        ju = jv = 0.5
    x = (u - cx + ju) / fx
    y = (v - cy + jv) / fy
    z = jnp.ones_like(u)
    if convention == "rdf":
        directions = jnp.stack([x, y, z], -1)
    elif convention == "rub":
        directions = jnp.stack([x, -y, -z], -1)
    else:
        raise ValueError(f"unknown camera convention {convention!r}")
    if flatten:
        directions = directions.reshape(-1, 3)
        grid = grid.reshape(-1, 2)
    if return_uv:
        return directions, grid
    return directions


# ScanNet aliases — the fork's debugged conventions (ray_utils.py:50-133).
def get_ray_directions_scannet(H, W, K, **kw):
    return get_ray_directions(H, W, K, convention="rdf", **kw)


def get_ray_directions_scannet_v2(H, W, K, **kw):
    return get_ray_directions(H, W, K, convention="rub", **kw)


def get_rays(directions: jnp.ndarray, c2w: jnp.ndarray):
    """Camera-space directions -> world-space rays.

    directions: (N, 3); c2w: (3, 4) or (N, 3, 4).
    Returns rays_o (N, 3), rays_d (N, 3) — rays_d NOT normalized (reference
    normalizes inside the model forward, `networks.py:110`).
    """
    directions = jnp.asarray(directions, jnp.float32)
    c2w = jnp.asarray(c2w, jnp.float32)
    hi = jax.lax.Precision.HIGHEST  # camera math must stay full fp32
    if c2w.ndim == 2:
        rays_d = jnp.einsum("nc,rc->nr", directions, c2w[:, :3], precision=hi)
        rays_o = jnp.broadcast_to(c2w[:, 3], rays_d.shape)
    else:
        rays_d = jnp.einsum("nc,nrc->nr", directions, c2w[..., :3],
                            precision=hi)
        rays_o = jnp.broadcast_to(c2w[..., 3], rays_d.shape)
    return rays_o, rays_d


def axisangle_to_R(v: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (B, 3) -> rotation matrices (B, 3, 3) via Rodrigues."""
    v = jnp.asarray(v, jnp.float32)
    zero = jnp.zeros_like(v[:, :1])
    skew = jnp.stack([
        jnp.concatenate([zero, -v[:, 2:3], v[:, 1:2]], 1),
        jnp.concatenate([v[:, 2:3], zero, -v[:, 0:1]], 1),
        jnp.concatenate([-v[:, 1:2], v[:, 0:1], zero], 1),
    ], axis=1)
    norm = (jnp.linalg.norm(v, axis=1) + 1e-7)[:, None, None]
    eye = jnp.eye(3, dtype=v.dtype)
    skew2 = jnp.einsum("bij,bjk->bik", skew, skew,
                       precision=jax.lax.Precision.HIGHEST)
    return (eye + jnp.sin(norm) / norm * skew
            + (1 - jnp.cos(norm)) / norm**2 * skew2)


# ----------------------------------------------------------------------------
# Pose normalisation helpers (numpy; used at dataset-build time on host).
# ----------------------------------------------------------------------------

def _normalize(v):
    return v / np.linalg.norm(v)


def average_poses(poses: np.ndarray, pts3d: np.ndarray) -> np.ndarray:
    """(N,3,4) poses + (M,3) points -> (3,4) average pose (see SURVEY §2.1)."""
    center = pts3d.mean(0)
    z = _normalize(poses[..., 2].mean(0))
    y_ = poses[..., 1].mean(0)
    x = _normalize(np.cross(y_, z))
    y = np.cross(z, x)
    return np.stack([x, y, z, center], 1)


def center_poses(poses: np.ndarray, pts3d: np.ndarray):
    """Recenters poses/points around the average pose."""
    pose_avg = average_poses(poses, pts3d)
    pose_avg_homo = np.eye(4)
    pose_avg_homo[:3] = pose_avg
    pose_avg_inv = np.linalg.inv(pose_avg_homo)
    last_row = np.tile(np.array([0, 0, 0, 1.0]), (len(poses), 1, 1))
    poses_homo = np.concatenate([poses, last_row], 1)
    poses_centered = (pose_avg_inv @ poses_homo)[:, :3]
    pts3d_centered = pts3d @ pose_avg_inv[:, :3].T + pose_avg_inv[:, 3:].T
    return poses_centered, pts3d_centered


def create_spheric_poses(radius: float, mean_h: float, n_poses: int = 120):
    """Circular camera path around the z axis (ray_utils.py:276-311)."""
    def spheric_pose(theta, phi, r):
        trans_t = np.array([[1, 0, 0, 0],
                            [0, 1, 0, 2 * mean_h],
                            [0, 0, 1, -r]], dtype=np.float64)
        rot_phi = np.array([[1, 0, 0],
                            [0, np.cos(phi), -np.sin(phi)],
                            [0, np.sin(phi), np.cos(phi)]])
        rot_theta = np.array([[np.cos(theta), 0, -np.sin(theta)],
                              [0, 1, 0],
                              [np.sin(theta), 0, np.cos(theta)]])
        c2w = rot_theta @ rot_phi @ trans_t
        c2w = np.array([[-1, 0, 0], [0, 0, 1], [0, 1, 0]], dtype=np.float64) @ c2w
        return c2w

    return np.stack([spheric_pose(th, -np.pi / 12, radius)
                     for th in np.linspace(0, 2 * np.pi, n_poses + 1)[:-1]], 0)
