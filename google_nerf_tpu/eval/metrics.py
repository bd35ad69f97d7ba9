"""Image quality metrics: MSE/PSNR/SSIM/LPIPS in pure JAX.

Parity targets (SURVEY.md §2.1 'Metrics'):
  * mse/psnr helpers            reference `ngp_pl/metrics.py:4-15`
  * torchmetrics PSNR/SSIM (data_range=1, gaussian kernel 11, sigma 1.5)
    used in `train.py:64-68`
  * LPIPS-vgg (frozen VGG16 + linear calibration heads, `train.py:68`):
    implemented natively below; pretrained weights must be supplied as an
    .npz (see tools/convert_lpips_weights.py) because this environment has
    no torchvision/lpips checkpoints — evaluation degrades gracefully when
    absent (returns None), mirroring the reference's optional --eval_lpips.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def mse(image_pred, image_gt, valid_mask=None):
    value = (image_pred - image_gt) ** 2
    if valid_mask is not None:
        value = value[valid_mask]
    return jnp.mean(value)


def psnr(image_pred, image_gt, valid_mask=None):
    return -10.0 * jnp.log10(
        jnp.maximum(mse(image_pred, image_gt, valid_mask), 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def _filter2d(img, kernel):
    """img: (N, C, H, W); kernel: (k, k) -> depthwise valid conv."""
    n, c, h, w = img.shape
    k = kernel.shape[0]
    kern = jnp.broadcast_to(kernel, (c, 1, k, k))
    return jax.lax.conv_general_dilated(
        img, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)


@partial(jax.jit, static_argnames=("data_range",))
def ssim(pred, gt, data_range: float = 1.0):
    """Structural similarity with torchmetrics defaults.

    pred/gt: (H, W, C) or (N, C, H, W); returns scalar mean SSIM.
    """
    if pred.ndim == 3:  # HWC -> NCHW
        pred = jnp.transpose(pred, (2, 0, 1))[None]
        gt = jnp.transpose(gt, (2, 0, 1))[None]
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    kern = _gaussian_kernel()
    mu_x = _filter2d(pred, kern)
    mu_y = _filter2d(gt, kern)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = _filter2d(pred * pred, kern) - mu_xx
    sig_y = _filter2d(gt * gt, kern) - mu_yy
    sig_xy = _filter2d(pred * gt, kern) - mu_xy
    num = (2 * mu_xy + c1) * (2 * sig_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sig_x + sig_y + c2)
    return jnp.mean(num / den)


# ---------------------------------------------------------------------------
# LPIPS (vgg16 backbone + linear heads)
# ---------------------------------------------------------------------------

# VGG16 conv layout; LPIPS taps the activation after each block's last ReLU.
_VGG_BLOCKS = ((64, 64), (128, 128), (256, 256, 256),
               (512, 512, 512), (512, 512, 512))
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_lpips_weights(path: str):
    """Load an .npz with conv{i}_w/conv{i}_b (OIHW) and lin{j}_w arrays."""
    data = np.load(path)
    return {k: jnp.asarray(v) for k, v in data.items()}


def _vgg_features(weights, x):
    """x: (N, 3, H, W) in [-1, 1] -> list of 5 block activations."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / \
        jnp.asarray(_SCALE)[None, :, None, None]
    feats = []
    li = 0
    for b, widths in enumerate(_VGG_BLOCKS):
        for _ in widths:
            w = weights[f"conv{li}_w"]
            bias = weights[f"conv{li}_b"]
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            x = jnp.maximum(x + bias[None, :, None, None], 0.0)
            li += 1
        feats.append(x)
        if b < len(_VGG_BLOCKS) - 1:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    return feats


@jax.jit
def _lpips_impl(weights, x, y):
    fx = _vgg_features(weights, x)
    fy = _vgg_features(weights, y)
    total = 0.0
    for j, (a, b) in enumerate(zip(fx, fy)):
        a = a / jnp.sqrt(jnp.sum(a * a, 1, keepdims=True) + 1e-10)
        b = b / jnp.sqrt(jnp.sum(b * b, 1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        lin = weights[f"lin{j}_w"]  # (1, C, 1, 1)
        total = total + jnp.mean(jnp.sum(d * lin, axis=1))
    return total


class LPIPS:
    """LPIPS-vgg scorer. images in [0,1], shape (H, W, 3)."""

    def __init__(self, weights_path: Optional[str] = None):
        self.weights = (load_lpips_weights(weights_path)
                        if weights_path else None)

    @property
    def available(self) -> bool:
        return self.weights is not None

    def __call__(self, pred, gt):
        if self.weights is None:
            return None
        x = jnp.clip(jnp.transpose(pred, (2, 0, 1))[None] * 2 - 1, -1, 1)
        y = jnp.clip(jnp.transpose(gt, (2, 0, 1))[None] * 2 - 1, -1, 1)
        return _lpips_impl(self.weights, x, y)
