"""NSVF-format datasets: Synthetic-NeRF / Synthetic-NSVF / BlendedMVS /
TanksAndTemples.

Behavior parity with reference `ngp_pl/datasets/nsvf.py` (bbox.txt AABB,
per-scene scale fixes, 0_/1_/2_ split prefixes, black->white bg fix,
alpha-on-white blending, [-0.5, 0.5]^3 pose normalisation), expressed as a
declarative per-family table + the shared parallel loaders
(data/loaders.py) instead of the reference's if-ladders and python loops.
"""
from __future__ import annotations

import dataclasses
import glob
import os
from typing import Optional, Tuple

import numpy as np

from google_nerf_tpu.core.rays import get_ray_directions
from google_nerf_tpu.data.base import BaseDataset
from google_nerf_tpu.data.loaders import (bbox_shift_scale, load_image_stack,
                                          load_pose_stack, normalize_c2w)


@dataclasses.dataclass(frozen=True)
class _Family:
    image_wh: Optional[Tuple[int, int]]    # None = read K file directly
    single_focal: bool                     # intrinsics.txt is one number
    test_prefix: str                       # split-file prefix for 'test'


# scene-family dispatch (reference's substring checks, nsvf.py:23-56)
_FAMILIES = {
    "Synthetic": _Family((800, 800), True, "2_"),
    "Ignatius": _Family((1920, 1080), True, "1_"),
    "BlendedMVS": _Family((768, 576), False, "1_"),
    "Tanks": _Family((1920, 1080), False, "1_"),
}

# per-scene AABB enlargements debugged into the reference (nsvf.py:23-27)
_SCENE_SCALE_FIX = {"Mic": 1.2, "Lego": 1.1}

# scenes whose black background must read as white (nsvf.py:96-98)
_BLACK_TO_WHITE = ("Jade", "Fountain")


def _family_of(root_dir: str) -> _Family:
    for token, fam in _FAMILIES.items():
        if token in root_dir:
            return fam
    raise ValueError(f"cannot infer NSVF scene family for {root_dir}")


class NSVFDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0, **kwargs):
        super().__init__(root_dir, split, downsample)
        fam = _family_of(root_dir)

        bbox = np.loadtxt(os.path.join(root_dir, "bbox.txt"))[:6]
        self.shift, self.scale = bbox_shift_scale(bbox[:3], bbox[3:6])
        for token, fix in _SCENE_SCALE_FIX.items():
            if token in root_dir and fam.single_focal:
                self.scale *= fix

        if fam.single_focal:
            with open(os.path.join(root_dir, "intrinsics.txt")) as f:
                focal = float(f.readline().split()[0]) * downsample
            w, h = (int(v * downsample) for v in fam.image_wh)
            K = np.float32([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]])
        else:
            K = np.loadtxt(os.path.join(root_dir, "intrinsics.txt"),
                           dtype=np.float32)[:3, :3]
            w, h = (int(v * downsample) for v in fam.image_wh)
            K[:2] *= downsample
        self.K = K.astype(np.float32)
        self.img_wh = (w, h)
        self.directions = np.asarray(get_ray_directions(h, w, self.K),
                                     np.float32)
        self._read_split(split, fam)

    # -- splits ------------------------------------------------------------

    def _read_split(self, split: str, fam: _Family):
        if split == "test_traj":
            self.poses = self._test_trajectory()
            return
        prefix = {"train": "0_", "trainval": "[0-1]_",
                  "test": fam.test_prefix}.get(split)
        if prefix is None:
            raise ValueError(f"{split} split not recognized!")
        img_paths = sorted(glob.glob(
            os.path.join(self.root_dir, "rgb", prefix + "*.png")))
        pose_paths = sorted(glob.glob(
            os.path.join(self.root_dir, "pose", prefix + "*.txt")))
        print(f"Loading {len(img_paths)} {split} images ...")

        fix_bg = any(t in self.root_dir for t in _BLACK_TO_WHITE)

        def white_fix(img):
            return np.where(np.all(img <= 0.1, -1, keepdims=True), 1.0, img)

        self.rays = load_image_stack(img_paths, self.img_wh,
                                     postprocess=white_fix if fix_bg
                                     else None)
        self.poses = normalize_c2w(load_pose_stack(pose_paths),
                                   self.shift, self.scale)

    def _test_trajectory(self) -> np.ndarray:
        """BlendedMVS / T&T fly-through cameras ([left down front] input)."""
        per_file = sorted(glob.glob(
            os.path.join(self.root_dir, "test_pose/*.txt")))
        if per_file:
            traj = load_pose_stack(per_file)
        else:
            traj = np.loadtxt(os.path.join(
                self.root_dir, "test_traj.txt")).reshape(-1, 4, 4)[:, :3]
        traj = np.array(traj, np.float32)
        traj[:, :, 0] *= -1  # ldf -> rdf
        return normalize_c2w(traj, self.shift, self.scale)
