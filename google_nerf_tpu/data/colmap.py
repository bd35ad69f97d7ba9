"""COLMAP dataset (reference `ngp_pl/datasets/colmap.py`): binary model
parsing, point-cloud centering, min-camera-norm scaling, every-8th-image test
split, spheric test trajectory."""
from __future__ import annotations

import os

import numpy as np

from google_nerf_tpu.core.rays import (center_poses, create_spheric_poses,
                                       get_ray_directions)
from google_nerf_tpu.data.base import BaseDataset
from google_nerf_tpu.data.color_utils import read_image
from google_nerf_tpu.data.colmap_utils import (read_cameras_binary,
                                               read_images_binary,
                                               read_points3d_binary)


class ColmapDataset(BaseDataset):
    def __init__(self, root_dir, split="train", downsample=1.0, **kwargs):
        super().__init__(root_dir, split, downsample)
        self.read_meta(split)

    def read_meta(self, split):
        # intrinsics (shared by all images)
        camdata = read_cameras_binary(
            os.path.join(self.root_dir, "sparse/0/cameras.bin"))
        cam = camdata[1]
        h = int(cam.height * self.downsample)
        w = int(cam.width * self.downsample)
        self.img_wh = (w, h)
        if cam.model == "SIMPLE_RADIAL":
            fx = fy = cam.params[0] * self.downsample
            cx = cam.params[1] * self.downsample
            cy = cam.params[2] * self.downsample
        elif cam.model in ["PINHOLE", "OPENCV"]:
            fx = cam.params[0] * self.downsample
            fy = cam.params[1] * self.downsample
            cx = cam.params[2] * self.downsample
            cy = cam.params[3] * self.downsample
        else:
            raise ValueError(
                f"Please parse the intrinsics for camera model {cam.model}!")
        self.K = np.float32([[fx, 0, cx], [0, fy, cy], [0, 0, 1]])
        self.directions = np.asarray(get_ray_directions(h, w, self.K),
                                     np.float32)

        # extrinsics: w2c -> c2w, sorted by image name
        imdata = read_images_binary(
            os.path.join(self.root_dir, "sparse/0/images.bin"))
        img_names = [imdata[k].name for k in imdata]
        perm = np.argsort(img_names)
        if "360_v2" in self.root_dir and self.downsample < 1:
            folder = f"images_{int(1 / self.downsample)}"
        else:
            folder = "images"
        img_paths = [os.path.join(self.root_dir, folder, name)
                     for name in sorted(img_names)]
        bottom = np.array([[0, 0, 0, 1.0]])
        w2c = []
        for k in imdata:
            im = imdata[k]
            R = im.qvec2rotmat()
            t = im.tvec.reshape(3, 1)
            w2c.append(np.concatenate(
                [np.concatenate([R, t], 1), bottom], 0))
        poses = np.linalg.inv(np.stack(w2c))[perm, :3]  # (N, 3, 4) c2w

        pts3d = read_points3d_binary(
            os.path.join(self.root_dir, "sparse/0/points3D.bin"))
        pts3d = np.array([pts3d[k].xyz for k in pts3d])

        self.poses, self.pts3d = center_poses(poses, pts3d)
        scale = np.linalg.norm(self.poses[..., 3], axis=-1).min()
        self.poses[..., 3] /= scale
        self.pts3d /= scale

        if split == "test_traj":
            self.poses = create_spheric_poses(
                1.2, self.poses[:, 1, 3].mean()).astype(np.float32)
            return

        # every 8th image is test (colmap.py:81-86)
        if split == "train":
            keep = [i for i in range(len(img_paths)) if i % 8 != 0]
        elif split == "test":
            keep = [i for i in range(len(img_paths)) if i % 8 == 0]
        else:
            keep = list(range(len(img_paths)))
        img_paths = [img_paths[i] for i in keep]
        self.poses = np.stack([self.poses[i] for i in keep]).astype(
            np.float32)

        print(f"Loading {len(img_paths)} {split} images ...")
        rays = [read_image(p, self.img_wh) for p in img_paths]
        self.rays = np.stack(rays).astype(np.float32)
