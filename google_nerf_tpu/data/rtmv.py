"""RTMV dataset (per-frame json camera_data; 100/5/45 split).

Behavior parity with reference `ngp_pl/datasets/rtmv.py` (bricks-subset
rescale into [-0.5, 0.5]^3), with vectorized pose assembly and the shared
parallel image loader.
"""
from __future__ import annotations

import glob
import json
import os

import numpy as np

from google_nerf_tpu.core.rays import get_ray_directions
from google_nerf_tpu.data.base import BaseDataset
from google_nerf_tpu.data.loaders import (bbox_shift_scale, load_image_stack,
                                          normalize_c2w)

# reference split boundaries (rtmv.py:48-51)
_SPLIT_RANGES = {"train": (0, 100), "trainval": (0, 105),
                 "test": (105, 150)}


class RTMVDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0, **kwargs):
        super().__init__(root_dir, split, downsample)
        ds = downsample
        with open(os.path.join(root_dir, "00000.json")) as f:
            meta = json.load(f)["camera_data"]
        self.shift, self.scale = bbox_shift_scale(
            np.asarray(meta["scene_min_3d_box"]),
            np.asarray(meta["scene_max_3d_box"]))
        self.shift = np.asarray(meta["scene_center_3d_box"], np.float32)
        intr = meta["intrinsics"]
        self.K = np.float32([[intr["fx"] * ds, 0, intr["cx"] * ds],
                             [0, intr["fy"] * ds, intr["cy"] * ds],
                             [0, 0, 1]])
        w, h = int(meta["width"] * ds), int(meta["height"] * ds)
        self.img_wh = (w, h)
        self.directions = np.asarray(get_ray_directions(h, w, self.K),
                                     np.float32)

        s, e = _SPLIT_RANGES.get(split, (0, 150))
        img_paths = sorted(glob.glob(
            os.path.join(root_dir, "images/*")))[s:e]
        json_paths = sorted(glob.glob(os.path.join(root_dir, "*.json")))[s:e]
        print(f"Loading {len(img_paths)} {split} images ...")

        def read_c2w(path):
            with open(path) as f:
                cam = json.load(f)["camera_data"]
            return np.asarray(cam["cam2world"], np.float32).T[:3]

        poses = np.stack([read_c2w(p) for p in json_paths])
        poses[:, :, 1:3] *= -1                    # OpenGL -> rdf
        if "bricks" in root_dir:                  # rtmv.py bricks rescale
            poses = normalize_c2w(poses, self.shift, self.scale)
        self.poses = poses.astype(np.float32)
        self.rays = load_image_stack(img_paths, self.img_wh)
