"""Image IO helpers (reference `ngp_pl/datasets/color_utils.py`)."""
from __future__ import annotations

import cv2
import imageio.v2 as imageio
import numpy as np


def srgb_to_linear(img):
    limit = 0.04045
    return np.where(img > limit, ((img + 0.055) / 1.055) ** 2.4, img / 12.92)


def linear_to_srgb(img):
    limit = 0.0031308
    img = np.where(img > limit, 1.055 * img ** (1 / 2.4) - 0.055, 12.92 * img)
    return np.minimum(img, 1.0)  # "clamp" tonemapper


def read_image(img_path: str, img_wh, blend_a: bool = True) -> np.ndarray:
    """Load an image -> ((h*w), 3) float32 in [0, 1]; alpha is blended onto a
    white (blend_a) or black background."""
    img = imageio.imread(img_path).astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.shape[2] == 4:
        if blend_a:
            img = img[..., :3] * img[..., -1:] + (1 - img[..., -1:])
        else:
            img = img[..., :3] * img[..., -1:]
    img = cv2.resize(img, tuple(img_wh))
    return img.reshape(-1, 3)
