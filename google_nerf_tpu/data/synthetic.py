"""Procedural synthetic scene with analytic ground truth.

This dataset has no counterpart in the reference (which verifies only by
full benchmark runs, SURVEY.md §4); it provides the "tiny synthetic scene
that must converge to high PSNR in seconds" smoke test and powers bench.py
on machines with no NeRF data on disk.

The scene is an analytic density/color field (soft spheres + a box inside
[-scale, scale]^3); ground-truth images are produced by dense volume
integration of the analytic field with the same compositor the framework
trains with, so a correct model/renderer can reach very high PSNR.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.core.rays import get_ray_directions, get_rays
from google_nerf_tpu.ops.composite import composite_rays_train
from google_nerf_tpu.ops.ray_aabb import clamp_near, ray_aabb_intersect

_SPHERES = (
    ((0.16, 0.02, 0.03), 0.17, (0.90, 0.20, 0.20)),
    ((-0.20, 0.10, 0.05), 0.14, (0.20, 0.50, 0.90)),
    ((0.00, -0.17, -0.12), 0.11, (0.95, 0.80, 0.20)),
)
_BOX = ((0.0, 0.20, 0.12), (0.20, 0.05, 0.14), (0.30, 0.85, 0.40))
_SIGMA_MAX = 80.0
_EDGE = 0.005  # soft-edge width (~3px at the 800^2 protocol)


_SHELL = 0.035  # shell thickness for style="shell"


def analytic_field(xyz: jnp.ndarray, style: str = "solid"):
    """xyz: (..., 3) -> (sigma (...,), rgb (..., 3)).

    style="solid": filled objects (opaque interiors).
    style="shell": the same surfaces as hollow shells — the realized
    samples-per-ray then matches real benchmark scenes (thin structures
    whose interiors the occupancy grid prunes), which is what bench.py
    should measure.
    style="textured": shell geometry with high-frequency surface
    displacement and a fine 3-D checker albedo.  Smooth styles
    under-stress the encoder (any tiny table fits them), which biases
    capacity A/Bs; this style makes table-size/level sweeps honest
    against Lego-class detail.
    """
    shelled = style in ("shell", "textured")
    if style == "textured":
        k1, k2 = 41.0, 19.0
        bump = (jnp.sin(k1 * xyz[..., 0]) * jnp.sin(k1 * xyz[..., 1])
                * jnp.sin(k1 * xyz[..., 2])
                + 0.5 * jnp.sin(k2 * (xyz[..., 0] + 1.7 * xyz[..., 1]
                                      - 0.6 * xyz[..., 2]))) / 1.5
        disp = 0.012 * bump
    else:
        disp = 0.0
    sigs, cols = [], []
    for (c, r, col) in _SPHERES:
        d = jnp.linalg.norm(xyz - jnp.asarray(c), axis=-1) + disp
        inside = jax.nn.sigmoid((r - d) / _EDGE)
        if shelled:
            inside = inside * jax.nn.sigmoid((d - (r - _SHELL)) / _EDGE)
        sigs.append(inside)
        cols.append(jnp.asarray(col))
    bc, bh, bcol = (jnp.asarray(v) for v in _BOX)
    db = jnp.max(jnp.abs(xyz - bc) - bh, axis=-1) + disp
    inside = jax.nn.sigmoid(-db / _EDGE)
    if shelled:
        inside = inside * jax.nn.sigmoid((db + _SHELL) / _EDGE)
    sigs.append(inside)
    cols.append(bcol)
    s = jnp.stack(sigs, -1)                       # (..., n_obj)
    sigma = _SIGMA_MAX * jnp.max(s, -1)
    w = s / jnp.maximum(s.sum(-1, keepdims=True), 1e-8)
    rgb = jnp.einsum("...o,oc->...c", w, jnp.stack(cols))
    if style == "textured":
        # fine two-palette checker + bump shading (stays in [0, 1])
        parity = jnp.sum(jnp.floor((xyz + 1.0) * 14.0), -1) % 2.0
        rgb = rgb * (0.45 + 0.4 * parity[..., None]) \
            + (1.0 - rgb) * 0.15 * (1.0 - parity[..., None])
        rgb = jnp.clip(rgb * (0.9 + 0.25 * bump[..., None]), 0.0, 1.0)
    return sigma, rgb


def _look_at_rdf(eye: np.ndarray, target: np.ndarray) -> np.ndarray:
    """c2w (3, 4) for the [right down front] camera convention."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    world_up = np.array([0.0, 0.0, 1.0])
    if abs(np.dot(fwd, world_up)) > 0.98:
        world_up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, world_up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)  # y points down in rdf
    return np.stack([right, down, fwd, eye], 1).astype(np.float32)


def _fibonacci_poses(n: int, radius: float, seed: int = 0) -> np.ndarray:
    golden = np.pi * (3 - 5 ** 0.5)
    poses = []
    for i in range(n):
        z = 1 - 2 * (i + 0.5) / n
        z = 0.15 + 0.75 * z  # stay above the equator-ish band
        rho = (1 - z * z) ** 0.5
        th = golden * i + seed * 0.37
        eye = radius * np.array([rho * np.cos(th), rho * np.sin(th), z])
        poses.append(_look_at_rdf(eye, np.zeros(3)))
    return np.stack(poses)


@partial(jax.jit, static_argnames=("n_steps", "scale", "style"))
def _integrate_gt(rays_o, rays_d, n_steps: int = 512, scale: float = 0.5,
                  style: str = "solid"):
    norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    d = rays_d / norm
    hits = clamp_near(
        ray_aabb_intersect(rays_o, d, jnp.zeros(3), jnp.full((3,), scale)),
        0.05)
    t1 = jnp.maximum(hits[:, 0], 0.0)
    t2 = jnp.where(hits[:, 1] > 0, hits[:, 1], t1)
    i = (jnp.arange(n_steps, dtype=jnp.float32) + 0.5) / n_steps
    ts = t1[:, None] + (t2 - t1)[:, None] * i[None, :]
    deltas = jnp.broadcast_to(((t2 - t1) / n_steps)[:, None], ts.shape)
    xyz = rays_o[:, None] + ts[..., None] * d[:, None]
    sigma, rgb = analytic_field(xyz, style)
    valid = jnp.broadcast_to((hits[:, 0] >= 0)[:, None], ts.shape)
    out = composite_rays_train(sigma, rgb, deltas, ts, valid)
    # premultiplied rgb + alpha (callers composite the background)
    return jnp.concatenate([out["rgb"], out["opacity"][:, None]], -1)


@dataclasses.dataclass
class SyntheticDataset:
    """API mirrors the reference datasets (rays/poses/directions/K/img_wh).

    root_dir/downsample exist for dataset-registry compatibility; the scene
    is procedural so root_dir is ignored and downsample scales img_wh."""
    root_dir: str = ""
    split: str = "train"
    downsample: float = 1.0
    n_images: int = 50
    img_wh: tuple = (64, 64)
    scale: float = 0.5
    cam_radius: float = 1.2
    seed: int = 0
    style: str = "solid"    # "solid" | "shell" | "textured"

    def __post_init__(self):
        w, h = (int(self.img_wh[0] * self.downsample),
                int(self.img_wh[1] * self.downsample))
        self.img_wh = (w, h)
        fx = fy = 1.0 * w
        self.K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]],
                          np.float32)
        self.directions = np.asarray(
            get_ray_directions(h, w, self.K), np.float32)
        seed = self.seed if self.split == "train" else self.seed + 1000
        self.poses = _fibonacci_poses(self.n_images, self.cam_radius, seed)
        # batch ground-truth integration across poses (one jitted call per
        # fixed-size ray chunk keeps device round-trips off the per-image
        # critical path)
        dirs = jnp.asarray(self.directions)
        o, d = jax.vmap(lambda p: get_rays(dirs, p))(jnp.asarray(self.poses))
        o = o.reshape(-1, 3)
        d = d.reshape(-1, 3)
        chunk = min(1 << 17, o.shape[0])  # (N,512,3) intermediates ~0.8GB
        pad = (-o.shape[0]) % chunk
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3))])
            d = jnp.concatenate([d, jnp.ones((pad, 3))])
        # the dense 512-step GT integration is expensive (minutes at 256^2+),
        # so completed renders are cached on disk keyed by every scene param
        cache_dir = os.environ.get(
            "GNT_GT_CACHE", os.path.expanduser("~/.cache/google_nerf_tpu"))
        cache_key = (f"gt_{self.split.split('_')[0]}_{self.n_images}x{w}x{h}"
                     f"_s{self.scale}_r{self.cam_radius}_seed{seed}"
                     f"_{self.style}.npz")
        cache_path = os.path.join(cache_dir, cache_key)
        if os.path.exists(cache_path):
            rgba = np.load(cache_path)["rgba"].astype(np.float32)
        else:
            # async-dispatch all chunks, fetch once (keeps the tunnel
            # pipelined)
            parts = [_integrate_gt(o[i:i + chunk], d[i:i + chunk],
                                   scale=self.scale, style=self.style)
                     for i in range(0, o.shape[0], chunk)]
            jax.block_until_ready(parts)
            rgba = np.concatenate([np.asarray(p) for p in parts])[
                :self.n_images * w * h].reshape(self.n_images, w * h, 4)
            try:
                os.makedirs(cache_dir, exist_ok=True)
                np.savez_compressed(cache_path + f".tmp{os.getpid()}.npz",
                                    rgba=rgba.astype(np.float16))
                os.replace(cache_path + f".tmp{os.getpid()}.npz", cache_path)
            except OSError:
                pass
        self.alphas = np.clip(rgba[..., 3], 0.0, 1.0).astype(np.float32)
        # white-composited images (the reference-facing view of the data)
        self.rays = np.clip(rgba[..., :3] + (1 - self.alphas[..., None]),
                            0.0, 1.0).astype(np.float32)

    def __len__(self):
        return 1000 if self.split.startswith("train") else len(self.poses)

    def sample(self, rng, batch_size=8192):
        img_idxs = rng.integers(0, len(self.poses), batch_size)
        pix_idxs = rng.integers(0, self.img_wh[0] * self.img_wh[1],
                                batch_size)
        return {"rgb": self.rays[img_idxs, pix_idxs],
                "img_idxs": img_idxs, "pix_idxs": pix_idxs}

    def scene(self, images_uint8: bool = False, depths=None):
        """Device-resident scene pytree for the fused train step.  Includes
        per-ray ground-truth alpha so training can composite onto RANDOM
        background colors — the standard cure for white-background floater
        fog (fluff that renders white is invisible to a fixed-white loss
        but fully supervised against a random background)."""
        imgs = self.rays
        if images_uint8:
            imgs = np.clip(imgs * 255.0 + 0.5, 0, 255).astype(np.uint8)
        s = dict(images=jnp.asarray(imgs),
                 alphas=jnp.asarray(self.alphas),
                 poses=jnp.asarray(self.poses),
                 directions=jnp.asarray(self.directions))
        if depths is not None:
            s["depths"] = jnp.asarray(depths)
        return s
