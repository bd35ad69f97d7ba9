"""NeRF++ dataset (reference `ngp_pl/datasets/nerfpp.py`): per-split
rgb/pose dirs, intrinsics from the first train file, camera_path test
trajectory."""
from __future__ import annotations

import glob
import os

import numpy as np
from PIL import Image

from google_nerf_tpu.core.rays import get_ray_directions
from google_nerf_tpu.data.base import BaseDataset
from google_nerf_tpu.data.color_utils import read_image


class NeRFPPDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0, **kwargs):
        super().__init__(root_dir, split, downsample)
        self.read_intrinsics()
        if kwargs.get("read_meta", True):
            self.read_meta(split)

    def read_intrinsics(self):
        K = np.loadtxt(
            glob.glob(os.path.join(self.root_dir,
                                   "train/intrinsics/*.txt"))[0],
            dtype=np.float32).reshape(4, 4)[:3, :3]
        K[:2] *= self.downsample
        w, h = Image.open(
            glob.glob(os.path.join(self.root_dir, "train/rgb/*"))[0]).size
        w, h = int(w * self.downsample), int(h * self.downsample)
        self.K = K
        self.directions = np.asarray(get_ray_directions(h, w, K), np.float32)
        self.img_wh = (w, h)

    def read_meta(self, split):
        if split == "test_traj":
            pose_files = sorted(glob.glob(
                os.path.join(self.root_dir, "camera_path/pose/*.txt")))
            self.poses = np.stack(
                [np.loadtxt(p).reshape(4, 4)[:3]
                 for p in pose_files]).astype(np.float32)
            return

        if split == "trainval":
            img_paths = (
                sorted(glob.glob(os.path.join(self.root_dir, "train/rgb/*")))
                + sorted(glob.glob(os.path.join(self.root_dir, "val/rgb/*"))))
            pose_files = (
                sorted(glob.glob(os.path.join(self.root_dir,
                                              "train/pose/*.txt")))
                + sorted(glob.glob(os.path.join(self.root_dir,
                                                "val/pose/*.txt"))))
        else:
            img_paths = sorted(glob.glob(
                os.path.join(self.root_dir, split, "rgb/*")))
            pose_files = sorted(glob.glob(
                os.path.join(self.root_dir, split, "pose/*.txt")))

        print(f"Loading {len(img_paths)} {split} images ...")
        poses, rays = [], []
        for img_path, pose in zip(img_paths, pose_files):
            poses.append(np.loadtxt(pose).reshape(4, 4)[:3])
            rays.append(read_image(img_path, self.img_wh))
        self.rays = np.stack(rays).astype(np.float32)
        self.poses = np.stack(poses).astype(np.float32)
