"""Ray/AABB and ray/sphere intersection (pure jnp slab tests).

TPU-native equivalents of `vren.ray_aabb_intersect` / `ray_sphere_intersect`
(reference wrappers: `ngp_pl/models/custom_functions.py:8-52`).  The reference
supports multiple voxels per ray (max_hits); the NGP pipeline only ever uses a
single scene box (`rendering.py:27-29`), so these return a single (t1, t2) per
ray with -1 sentinel on miss.
"""
from __future__ import annotations

import jax.numpy as jnp


def ray_aabb_intersect(rays_o, rays_d, center, half_size):
    """Slab test of rays against one axis-aligned box.

    rays_o, rays_d: (N, 3); center, half_size: (3,) or (1, 3).
    Returns hits_t: (N, 2) with [max(t1, 0), t2]; both -1 where the ray misses.
    """
    center = jnp.reshape(jnp.asarray(center, jnp.float32), (1, 3))
    half = jnp.reshape(jnp.asarray(half_size, jnp.float32), (1, 3))
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) > 1e-10, rays_d,
                            jnp.where(rays_d >= 0, 1e-10, -1e-10))
    t_lo = (center - half - rays_o) * inv_d
    t_hi = (center + half - rays_o) * inv_d
    t1 = jnp.max(jnp.minimum(t_lo, t_hi), axis=-1)
    t2 = jnp.min(jnp.maximum(t_lo, t_hi), axis=-1)
    t1 = jnp.maximum(t1, 0.0)
    hit = t2 > t1
    return jnp.where(hit[:, None],
                     jnp.stack([t1, t2], axis=-1),
                     jnp.full((rays_o.shape[0], 2), -1.0, jnp.float32))


def ray_sphere_intersect(rays_o, rays_d, center, radius):
    """Analytic ray/sphere intersection. center: (3,), radius: scalar.

    Returns hits_t: (N, 2) ([max(t1,0), t2], -1 on miss).
    """
    center = jnp.reshape(jnp.asarray(center, jnp.float32), (1, 3))
    oc = rays_o - center
    a = jnp.sum(rays_d * rays_d, -1)
    b = 2.0 * jnp.sum(oc * rays_d, -1)
    c = jnp.sum(oc * oc, -1) - radius**2
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = jnp.maximum((-b - sq) / (2 * a), 0.0)
    t2 = (-b + sq) / (2 * a)
    hit = (disc > 0) & (t2 > t1)
    return jnp.where(hit[:, None],
                     jnp.stack([t1, t2], axis=-1),
                     jnp.full((rays_o.shape[0], 2), -1.0, jnp.float32))


def clamp_near(hits_t, near: float):
    """Push valid near bounds below `near` out to `near`
    (reference `rendering.py:27-29`, NEAR_DISTANCE=0.05)."""
    t1 = hits_t[:, 0]
    t1 = jnp.where((t1 >= 0) & (t1 < near), near, t1)
    return jnp.stack([t1, hits_t[:, 1]], axis=-1)
