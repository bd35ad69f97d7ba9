"""Multi-dataset loader for depth training.

TPU-native rebuild of `Train/data/multi_dataset.py` (annotation-JSON
datasets with online augmentation) and
`Train/data/load_dataset_distributed.py:40-287` (the interleaving
multi-dataset sampler).

Pipeline shape: host-side numpy augmentation -> fixed (crop_h, crop_w)
arrays -> batches ready for a jitted train step.  Each dataset is a list
of annotations `{rgb_path, depth_path, (optional) disp_path, sky_path,
plane_path}` from `<root>/annotations/<split>_annotations*.json`.

Semantics preserved from the reference:
  * depth/disp normalized to max 10 (`multi_dataset.py:268-271`)
  * invalid -> -1; sky -> disp 0 / depth 20 (`:273-276`)
  * quality_flg: 3 for taskonomy/3d-ken-burns, 2 for diml, 1 otherwise
    (`:199-205`)
  * aug: flip / resize (ratio in [0.5, 1.2] of crop) / random crop / pad
    (`set_flip_resize_crop_pad`, `:314-360`), color jitter on rgb
  * ImageNet rgb normalisation (`scale_torch`, `:362-380`)
  * sampler interleaves datasets [A, B, C, A, B, C, ...] with per-rank
    strided shards (`load_dataset_distributed.py:40-287`)
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from google_nerf_tpu.depth.config import DatasetCfg

_QUALITY = {"taskonomy": 3, "3d-ken-burns": 3, "diml": 2}
_FOCAL = {"taskonomy": 512.0}


def _read_image(path: str) -> np.ndarray:
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
        if img.ndim == 3:
            img = img[:, :, ::-1]  # BGR -> RGB
        return img
    except ImportError:
        import imageio.v2 as imageio
        return np.asarray(imageio.imread(path))


def _resize(img: np.ndarray, hw, nearest: bool) -> np.ndarray:
    try:
        import cv2
        interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
        return cv2.resize(img, (hw[1], hw[0]), interpolation=interp)
    except ImportError:
        h, w = img.shape[:2]
        yi = np.clip((np.arange(hw[0]) * h / hw[0]).astype(int), 0, h - 1)
        xi = np.clip((np.arange(hw[1]) * w / hw[1]).astype(int), 0, w - 1)
        return img[yi][:, xi]


class DepthAnnotationDataset:
    """One source dataset (reference `MultiDataset`, one annotation file)."""

    def __init__(self, root: str, name: str, split: str = "train",
                 cfg: DatasetCfg = DatasetCfg(),
                 annotations: Optional[List[dict]] = None):
        self.root, self.name, self.split, self.cfg = root, name, split, cfg
        if annotations is None:
            path = None
            adir = os.path.join(root, name, "annotations")
            for suffix in (f"{split}_annotations_subset.json",
                           f"{split}_annotations.json"):
                cand = os.path.join(adir, suffix)
                if os.path.exists(cand):
                    path = cand
                    break
            if path is None:
                raise FileNotFoundError(f"no annotations for {name}/{split}")
            with open(path) as f:
                annotations = json.load(f)
        self.annotations = annotations
        key = next((k for k in _QUALITY if k in name.lower()), None)
        self.quality_flg = _QUALITY.get(key, 1)
        self.focal_length = _FOCAL.get(name.lower(), cfg.focal_x)

    def __len__(self):
        return len(self.annotations)

    def _load_raw(self, i: int):
        a = self.annotations[i]
        rgb = _read_image(os.path.join(self.root, a["rgb_path"])
                          if not os.path.isabs(a["rgb_path"])
                          else a["rgb_path"]).astype(np.float32)
        if rgb.max() > 1.5:
            rgb = rgb / 255.0
        depth = _read_image(os.path.join(self.root, a["depth_path"])
                            if not os.path.isabs(a["depth_path"])
                            else a["depth_path"]).astype(np.float32)
        if depth.ndim == 3:
            depth = depth[..., 0]
        disp = np.where(depth > 1e-8, 1.0 / np.maximum(depth, 1e-8), 0.0)
        return rgb, depth, disp

    def _finalize(self, rgb, depth, disp, planes):
        c = self.cfg
        depth = depth / (depth.max() + 1e-8) * 10.0
        disp = disp / (disp.max() + 1e-8) * 10.0
        invalid = (depth > 1e7) | (depth < 0)
        depth = np.where(invalid, c.invalid_value, depth)
        disp = np.where((disp > 1e7) | (disp < 0), c.invalid_value, disp)
        rgb = (rgb - np.asarray(c.rgb_pixel_means)) \
            / np.asarray(c.rgb_pixel_vars)
        return dict(rgb=rgb.astype(np.float32),
                    depth=depth.astype(np.float32),
                    disp=disp.astype(np.float32),
                    planes=planes.astype(np.int32),
                    focal_length=np.float32(self.focal_length),
                    quality_flg=np.int32(self.quality_flg))

    def get_val(self, i: int) -> Dict[str, np.ndarray]:
        """Deterministic center-crop item (`online_aug_val`)."""
        rgb, depth, disp = self._load_raw(i)
        ch, cw = self.cfg.crop_size
        rgb = _resize(rgb, (ch, cw), nearest=False)
        depth = _resize(depth, (ch, cw), nearest=True)
        disp = _resize(disp, (ch, cw), nearest=True)
        return self._finalize(rgb, depth, disp,
                              np.zeros((ch, cw), np.int32))

    def get_train(self, i: int, rng: np.random.Generator
                  ) -> Dict[str, np.ndarray]:
        """Randomly augmented item (`online_aug`, `multi_dataset.py:212`)."""
        rgb, depth, disp = self._load_raw(i)
        ch, cw = self.cfg.crop_size
        # color jitter: contrast 0.3, saturation 0.1 (`rgb_aug`, `:300-312`)
        contrast = 1.0 + rng.uniform(-0.3, 0.3)
        mean = rgb.mean()
        rgb = np.clip((rgb - mean) * contrast + mean, 0, 1)
        gray = rgb.mean(-1, keepdims=True)
        sat = 1.0 + rng.uniform(-0.1, 0.1)
        rgb = np.clip(gray + (rgb - gray) * sat, 0, 1)
        # flip / resize / crop / pad (`set_flip_resize_crop_pad`)
        if rng.random() < 0.5:
            rgb, depth, disp = rgb[:, ::-1], depth[:, ::-1], disp[:, ::-1]
        ratio = rng.choice([0.5, 0.6, 0.8, 1.0, 1.2])
        rh, rw = max(int(ch * ratio), 1), max(int(cw * ratio), 1)
        rh2 = max(rh, int(rh * ch / max(cw, 1)))
        rgb = _resize(rgb, (rh2, rw), nearest=False)
        depth = _resize(depth, (rh2, rw), nearest=True)
        disp = _resize(disp, (rh2, rw), nearest=True)

        def crop_pad(img, fill):
            h, w = img.shape[:2]
            if h >= ch and w >= cw:
                y0 = rng.integers(0, h - ch + 1)
                x0 = rng.integers(0, w - cw + 1)
                return img[y0:y0 + ch, x0:x0 + cw]
            pad_h, pad_w = max(ch - h, 0), max(cw - w, 0)
            pads = [(0, pad_h), (0, pad_w)] + \
                [(0, 0)] * (img.ndim - 2)
            return np.pad(img, pads, constant_values=fill)[:ch, :cw]

        # identical crop offsets across modalities: crop first on stacked
        stack = np.concatenate([rgb, depth[..., None], disp[..., None]], -1)
        stack = crop_pad(stack, 0.0)
        rgb, depth, disp = stack[..., :3], stack[..., 3], stack[..., 4]
        return self._finalize(rgb, depth, disp,
                              np.zeros((ch, cw), np.int32))


class MultiDatasetSampler:
    """Interleaves N datasets [A,B,C,A,B,C,...] with per-rank strided shards
    (`CustomerMultiDataSampler`, `load_dataset_distributed.py:40-287`)."""

    def __init__(self, datasets: Sequence[DepthAnnotationDataset],
                 rank: int = 0, world_size: int = 1, seed: int = 0):
        self.datasets = list(datasets)
        self.rank, self.world = rank, world_size
        self.seed = seed
        self.max_len = max(len(d) for d in self.datasets)

    def __len__(self):
        per = self.max_len * len(self.datasets)
        return per // self.world

    def epoch_indices(self, epoch: int) -> List[tuple]:
        """[(dataset_idx, item_idx), ...] for this rank and epoch; each
        dataset is tiled up to max_len so the interleave is balanced
        (reference logs per-dataset sampled sizes)."""
        rng = np.random.default_rng(self.seed + epoch)
        per_ds = []
        for d in self.datasets:
            idx = rng.permutation(len(d))
            reps = int(np.ceil(self.max_len / len(d)))
            per_ds.append(np.tile(idx, reps)[:self.max_len])
        order = []
        for i in range(self.max_len):
            for k in range(len(self.datasets)):
                order.append((k, int(per_ds[k][i])))
        return order[self.rank::self.world]

    def batches(self, epoch: int, batch_size: int, train: bool = True):
        """Yield stacked batch dicts."""
        rng = np.random.default_rng(self.seed * 7919 + epoch)
        idxs = self.epoch_indices(epoch)
        for i in range(0, len(idxs) - batch_size + 1, batch_size):
            items = []
            for ds_i, it_i in idxs[i:i + batch_size]:
                d = self.datasets[ds_i]
                items.append(d.get_train(it_i, rng) if train
                             else d.get_val(it_i))
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}
