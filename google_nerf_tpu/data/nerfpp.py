"""NeRF++-layout dataset (per-split rgb/ pose/ intrinsics/ directories).

Behavior parity with reference `ngp_pl/datasets/nerfpp.py`; expressed over
the shared parallel loaders with a single split->directories table.
"""
from __future__ import annotations

import glob
import os

import numpy as np

from google_nerf_tpu.core.rays import get_ray_directions
from google_nerf_tpu.data.base import BaseDataset
from google_nerf_tpu.data.loaders import load_image_stack, load_pose_stack


def _split_dirs(split: str):
    return {"trainval": ("train", "val")}.get(split, (split,))


class NeRFPPDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0, **kwargs):
        super().__init__(root_dir, split, downsample)
        ds = downsample
        K = np.loadtxt(glob.glob(
            os.path.join(root_dir, "train/intrinsics/*.txt"))[0],
            dtype=np.float32).reshape(4, 4)[:3, :3]
        K[:2] *= ds
        from PIL import Image
        with Image.open(glob.glob(
                os.path.join(root_dir, "train/rgb/*"))[0]) as im:
            w, h = (int(v * ds) for v in im.size)
        self.K = K
        self.img_wh = (w, h)
        self.directions = np.asarray(get_ray_directions(h, w, K), np.float32)

        if split == "test_traj":  # fly-through cameras, no images
            pose_paths = sorted(glob.glob(
                os.path.join(root_dir, "camera_path/pose/*.txt")))
            self.poses = load_pose_stack(pose_paths)
            return

        img_paths, pose_paths = [], []
        for d in _split_dirs(split):
            img_paths += sorted(glob.glob(
                os.path.join(root_dir, d, "rgb/*")))
            pose_paths += sorted(glob.glob(
                os.path.join(root_dir, d, "pose/*.txt")))
        print(f"Loading {len(img_paths)} {split} images ...")
        self.rays = load_image_stack(img_paths, self.img_wh)
        self.poses = load_pose_stack(pose_paths)
