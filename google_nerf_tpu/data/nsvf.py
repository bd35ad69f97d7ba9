"""NSVF-format datasets (Synthetic-NeRF / Synthetic-NSVF / BlendedMVS /
TanksAndTemples).  Semantics from reference `ngp_pl/datasets/nsvf.py`:
bbox.txt AABB with per-scene scale fixes (Mic x1.2, Lego x1.1), split
prefixes 0_/1_/2_, black->white bg fix for Jade/Fountain, alpha blending,
poses shifted and divided by 2*scale into [-0.5, 0.5]^3.
"""
from __future__ import annotations

import glob
import os

import numpy as np

from google_nerf_tpu.core.rays import get_ray_directions
from google_nerf_tpu.data.base import BaseDataset
from google_nerf_tpu.data.color_utils import read_image


class NSVFDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0, **kwargs):
        super().__init__(root_dir, split, downsample)

        xyz_min, xyz_max = \
            np.loadtxt(os.path.join(root_dir, "bbox.txt"))[:6].reshape(2, 3)
        self.shift = (xyz_max + xyz_min) / 2
        self.scale = (xyz_max - xyz_min).max() / 2 * 1.05  # enlarge a little

        if "Synthetic" in root_dir or "Ignatius" in root_dir:
            # hard-coded bound fixes for some scenes (nsvf.py:23-27)
            if "Mic" in root_dir:
                self.scale *= 1.2
            elif "Lego" in root_dir:
                self.scale *= 1.1
            with open(os.path.join(root_dir, "intrinsics.txt")) as f:
                fx = fy = float(f.readline().split()[0]) * downsample
            if "Synthetic" in root_dir:
                w = h = int(800 * downsample)
            else:
                w, h = int(1920 * downsample), int(1080 * downsample)
            K = np.float32([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]])
        else:
            K = np.loadtxt(os.path.join(root_dir, "intrinsics.txt"),
                           dtype=np.float32)[:3, :3]
            if "BlendedMVS" in root_dir:
                w, h = int(768 * downsample), int(576 * downsample)
            elif "Tanks" in root_dir:
                w, h = int(1920 * downsample), int(1080 * downsample)
            else:
                raise ValueError(
                    f"cannot infer image size for {root_dir}")
            K[:2] *= downsample
        self.K = K.astype(np.float32)
        self.directions = np.asarray(get_ray_directions(h, w, self.K),
                                     np.float32)
        self.img_wh = (w, h)
        self.read_meta(split)

    def read_meta(self, split):
        rays, poses = [], []

        if split == "test_traj":  # BlendedMVS and TanksAndTemple
            if "Ignatius" in self.root_dir:
                pose_files = sorted(glob.glob(
                    os.path.join(self.root_dir, "test_pose/*.txt")))
                traj = [np.loadtxt(p) for p in pose_files]
            else:
                traj = np.loadtxt(
                    os.path.join(self.root_dir, "test_traj.txt"))
                traj = traj.reshape(-1, 4, 4)
            for pose in traj:
                c2w = np.array(pose[:3], np.float64)
                c2w[:, 0] *= -1  # [left down front] -> [right down front]
                c2w[:, 3] -= self.shift
                c2w[:, 3] /= 2 * self.scale
                poses.append(c2w)
        else:
            if split == "train":
                prefix = "0_"
            elif split == "trainval":
                prefix = "[0-1]_"
            elif "Synthetic" in self.root_dir:
                prefix = "2_"
            elif split == "test":
                prefix = "1_"  # test set for real scenes
            else:
                raise ValueError(f"{split} split not recognized!")
            imgs = sorted(glob.glob(
                os.path.join(self.root_dir, "rgb", prefix + "*.png")))
            pose_files = sorted(glob.glob(
                os.path.join(self.root_dir, "pose", prefix + "*.txt")))

            print(f"Loading {len(imgs)} {split} images ...")
            for img_path, pose in zip(imgs, pose_files):
                c2w = np.loadtxt(pose)[:3]
                c2w[:, 3] -= self.shift
                c2w[:, 3] /= 2 * self.scale
                poses.append(c2w)

                img = read_image(img_path, self.img_wh)
                if "Jade" in self.root_dir or "Fountain" in self.root_dir:
                    # black background scenes -> white (nsvf.py:96-98)
                    img[np.all(img <= 0.1, axis=-1)] = 1.0
                rays.append(img)
            self.rays = np.stack(rays).astype(np.float32)
        self.poses = np.stack(poses).astype(np.float32)
