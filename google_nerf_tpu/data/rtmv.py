"""RTMV dataset (reference `ngp_pl/datasets/rtmv.py`): json camera_data,
100/5/45 split, bricks-subset rescale into [-0.5, 0.5]^3."""
from __future__ import annotations

import glob
import json
import os

import numpy as np

from google_nerf_tpu.core.rays import get_ray_directions
from google_nerf_tpu.data.base import BaseDataset
from google_nerf_tpu.data.color_utils import read_image


class RTMVDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0, **kwargs):
        super().__init__(root_dir, split, downsample)
        self.read_intrinsics()
        if kwargs.get("read_meta", True):
            self.read_meta(split)

    def read_intrinsics(self):
        with open(os.path.join(self.root_dir, "00000.json")) as f:
            meta = json.load(f)["camera_data"]
        self.shift = np.array(meta["scene_center_3d_box"])
        self.scale = (np.array(meta["scene_max_3d_box"])
                      - np.array(meta["scene_min_3d_box"])).max() / 2 * 1.05
        ds = self.downsample
        fx, fy = meta["intrinsics"]["fx"] * ds, meta["intrinsics"]["fy"] * ds
        cx, cy = meta["intrinsics"]["cx"] * ds, meta["intrinsics"]["cy"] * ds
        w, h = int(meta["width"] * ds), int(meta["height"] * ds)
        self.K = np.float32([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
        self.directions = np.asarray(get_ray_directions(h, w, self.K),
                                     np.float32)
        self.img_wh = (w, h)

    def read_meta(self, split):
        if split == "train":
            s, e = 0, 100
        elif split == "trainval":
            s, e = 0, 105
        elif split == "test":
            s, e = 105, 150
        else:
            s, e = 0, 150
        img_paths = sorted(glob.glob(
            os.path.join(self.root_dir, "images/*")))[s:e]
        pose_files = sorted(glob.glob(
            os.path.join(self.root_dir, "*.json")))[s:e]

        print(f"Loading {len(img_paths)} {split} images ...")
        poses, rays = [], []
        for img_path, pose in zip(img_paths, pose_files):
            with open(pose) as f:
                p = json.load(f)["camera_data"]
            c2w = np.array(p["cam2world"]).T[:3]
            c2w[:, 1:3] *= -1
            if "bricks" in self.root_dir:
                c2w[:, 3] -= self.shift
                c2w[:, 3] /= 2 * self.scale
            poses.append(c2w)
            rays.append(read_image(img_path, self.img_wh))
        self.rays = np.stack(rays).astype(np.float32)
        self.poses = np.stack(poses).astype(np.float32)
