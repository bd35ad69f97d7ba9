"""Base dataset: length & sampling conventions.

Mirrors reference `ngp_pl/datasets/base.py`: a training "epoch" is 1000
iterations; each training item is a batch of `batch_size` random
(image, pixel) pairs `{rgb, img_idxs, pix_idxs}`; test items are per-image
`{pose, img_idxs, rgb}`.

TPU addition: `scene()` exports the whole dataset as a device-resident pytree
(images can be stored uint8 to fit HBM) so batch sampling runs on-chip inside
the fused train step — the host feeds only PRNG keys.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class BaseDataset:
    def __init__(self, root_dir: str, split: str = "train",
                 downsample: float = 1.0):
        self.root_dir = root_dir
        self.split = split
        self.downsample = downsample
        self.batch_size = 8192
        self.rays: np.ndarray = np.zeros((0, 0, 3), np.float32)
        self.poses: np.ndarray = np.zeros((0, 3, 4), np.float32)
        self.depths = None  # optional (N, HW) depth priors

    def __len__(self):
        if self.split.startswith("train"):
            return 1000
        return len(self.poses)

    def sample(self, rng: np.random.Generator, batch_size=None):
        """Host-side random ray batch (numpy)."""
        bs = batch_size or self.batch_size
        img_idxs = rng.integers(0, len(self.poses), bs)
        pix_idxs = rng.integers(0, self.img_wh[0] * self.img_wh[1], bs)
        batch = {"rgb": self.rays[img_idxs, pix_idxs],
                 "img_idxs": img_idxs, "pix_idxs": pix_idxs}
        if self.depths is not None:
            batch["depth"] = self.depths[img_idxs, pix_idxs]
        return batch

    def __getitem__(self, idx):
        if self.split.startswith("train"):
            return self.sample(np.random.default_rng())
        sample = {"pose": self.poses[idx], "img_idxs": idx}
        if len(self.rays) > 0:
            sample["rgb"] = self.rays[idx]
        return sample

    def scene(self, images_uint8: bool = False):
        """Device-resident scene pytree for the fused train step."""
        imgs = self.rays
        if images_uint8:
            imgs = np.clip(imgs * 255.0 + 0.5, 0, 255).astype(np.uint8)
        s = dict(images=jnp.asarray(imgs),
                 poses=jnp.asarray(self.poses, jnp.float32),
                 directions=jnp.asarray(self.directions, jnp.float32))
        if self.depths is not None:
            s["depths"] = jnp.asarray(self.depths, jnp.float32)
        return s
