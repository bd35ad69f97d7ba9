"""Surface normals from depth (for the PWN losses).

TPU-native rebuild of
`AdelaiDepth/LeReS/Train/lib/models/Surface_normal.py:1-213`:
  * `depth_to_xyz` — unproject with principal point at the image centre.
  * `get_surface_normal_v2` — cross products of the +/- half-patch
    horizontal/vertical central differences at two scales, averaged and
    consistently oriented (`Surface_normal.py:96-157`).
  * `surface_normal_from_depth` — two 3x3 box blurs then normals
    (`Surface_normal.py:159-177`).

Layout: depth maps are (B, H, W) or (B, H, W, 1); xyz is (B, H, W, 3).
Batched with plain broadcasting (the reference loops over the batch).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_to_xyz(depth, focal_length):
    """depth: (B, H, W); focal_length: (B,) -> xyz (B, H, W, 3).

    Pinhole unprojection, principal point at (W/2, H/2)
    (`Surface_normal.py:6-30`)."""
    b, h, w = depth.shape
    u = jnp.arange(w, dtype=depth.dtype) - w / 2.0
    v = jnp.arange(h, dtype=depth.dtype) - h / 2.0
    f = focal_length.reshape(b, 1, 1)
    x = u[None, None, :] * depth / f
    y = v[None, :, None] * depth / f
    return jnp.stack([x, y, depth], axis=-1)


def box_blur_3x3(img):
    """(B, H, W) 3x3 average blur, zero padding (avg_pool2d semantics with
    count_include_pad=True, the torch default used at
    `Surface_normal.py:163-164`)."""
    x = img[..., None]
    x = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), "SAME") / 9.0
    return x[..., 0]


def _orient(n, xyz):
    flip = jnp.sum(n * xyz, axis=-1, keepdims=True) > 0
    return jnp.where(flip, -n, n)


def _unit(n, eps=1e-8):
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + eps)


def get_surface_normal_v2(xyz, patch_size: int = 5):
    """xyz: (B, H, W, 3) -> unit normals (B, H, W, 3)
    (`Surface_normal.py:96-157`)."""
    b, h, w, _ = xyz.shape
    half = patch_size // 2
    pad = [(0, 0), (half, half), (half, half), (0, 0)]
    xp = jnp.pad(xyz, pad)

    # outer differences (offset = half patch)
    horiz = xp[:, half:half + h, :w] - xp[:, half:half + h, -w:]
    vert = xp[:, :h, half:half + w] - xp[:, -h:, half:half + w]
    # inner differences (offset = 1 ... patch-1 window edges)
    horiz_in = (xp[:, half:half + h, 1:w + 1]
                - xp[:, half:half + h, patch_size - 1:patch_size - 1 + w])
    vert_in = (xp[:, 1:h + 1, half:half + w]
               - xp[:, patch_size - 1:patch_size - 1 + h, half:half + w])

    n1 = _unit(_orient(jnp.cross(horiz_in, vert_in), xyz))
    n2 = _unit(_orient(jnp.cross(horiz, vert), xyz))
    return _orient(_unit(n1 + n2), xyz)


def surface_normal_from_depth(depth, focal_length, valid_mask=None):
    """depth: (B, H, W); focal_length: (B,); valid_mask: (B, H, W) bool.
    Returns (B, H, W, 3) (`Surface_normal.py:159-177`)."""
    d = box_blur_3x3(box_blur_3x3(depth))
    n = get_surface_normal_v2(depth_to_xyz(d, focal_length))
    if valid_mask is not None:
        n = jnp.where(valid_mask[..., None], n, 0.0)
    return n
