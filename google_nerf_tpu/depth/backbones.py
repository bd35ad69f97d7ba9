"""ResNet / ResNeXt encoders for the LeReS depth network, in flax (NHWC).

TPU-native rebuild of the reference backbones
(`AdelaiDepth/LeReS/Minist_Test/lib/Resnet.py:94-199`,
`Minist_Test/lib/Resnext_torch.py`, and the cIMLE-AdaIN variant
`Train/lib/models/Resnext_torch.py:332-478`).

Design notes (deliberately different from the torch reference):
  * NHWC layout end to end — the native TPU convolution layout.
  * The encoder returns the four lateral feature maps (1/4, 1/8, 1/16, 1/32)
    that the LeReS decoder consumes; no classification head exists at all.
  * cIMLE support is a constructor flag: when `d_latent > 0` the encoder
    carries four AdaIN style modulators injected after conv1 / layer1 /
    layer2 / layer3 (matching `Train/lib/models/Resnext_torch.py:439-456`),
    each with calibratable mean/var shift variables
    (`set_mean_var_shifts`, `Resnext_torch.py:464-476`).
  * BatchNorm can run cross-replica (SyncBN parity,
    `Train/tools/train.py:473`) by passing `bn_axis_name="data"`.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from google_nerf_tpu.depth.adain import AdaInMod


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=self.kernel // 2,
                    feature_group_count=self.groups, use_bias=False)(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            axis_name=self.bn_axis_name)(x)


class BasicBlock(nn.Module):
    """Two 3x3 convs; used by resnet18/34. expansion = 1."""
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    bn_axis_name: Optional[str] = None
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = nn.relu(ConvBN(self.planes, 3, self.stride,
                             bn_axis_name=self.bn_axis_name)(x, train))
        out = ConvBN(self.planes, 3, 1,
                     bn_axis_name=self.bn_axis_name)(out, train)
        if self.downsample:
            identity = ConvBN(self.planes, 1, self.stride,
                              bn_axis_name=self.bn_axis_name)(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 -> 3x3(groups) -> 1x1 with 4x expansion; resnet50+ / resnext."""
    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    bn_axis_name: Optional[str] = None
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = nn.relu(ConvBN(width, 1,
                             bn_axis_name=self.bn_axis_name)(x, train))
        out = nn.relu(ConvBN(width, 3, self.stride, self.groups,
                             bn_axis_name=self.bn_axis_name)(out, train))
        out = ConvBN(self.planes * 4, 1,
                     bn_axis_name=self.bn_axis_name)(out, train)
        if self.downsample:
            identity = ConvBN(self.planes * 4, 1, self.stride,
                              bn_axis_name=self.bn_axis_name)(x, train)
        return nn.relu(out + identity)


_ARCHS = {
    # name -> (block, layers, groups, width_per_group)
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1, 64),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1, 64),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 1, 64),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 1, 64),
    "resnet152": (Bottleneck, (3, 8, 36, 3), 1, 64),
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3), 32, 8),
}

# reference encoder aliases (`Minist_Test/lib/network_auxi.py:8-12`)
ENCODER_ALIASES = {
    "resnet50_stride32": "resnet50",
    "resnext101_stride32x8d": "resnext101_32x8d",
}


class LateralEncoder(nn.Module):
    """Stem + 4 stages; returns [1/4, 1/8, 1/16, 1/32] lateral features.

    With `d_latent > 0`, a 32-(or 512-)dim latent `z` modulates activations
    at the four AdaIN points of the cIMLE encoder
    (`Train/lib/models/Resnext_torch.py:439-456`): after conv1 (pre-BN) and
    after each of layer1/2/3.  The per-point mean/var calibration shifts are
    flax variables in the "adain_stats" collection so they checkpoint with
    the params (reference: `set_mean_var_shifts`).
    """
    arch: str = "resnext101_32x8d"
    d_latent: int = 0
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, z=None, train: bool = False,
                 return_adain_acts: bool = False):
        block, layers, groups, base_width = _ARCHS[
            ENCODER_ALIASES.get(self.arch, self.arch)]
        exp = block.expansion
        cimle = self.d_latent > 0
        acts = []

        def style(name, h, channels):
            if not cimle:
                return h
            mod = AdaInMod(self.d_latent, channels, name=name)
            h = mod(h, z)
            if return_adain_acts:
                acts.append(h)
            return h

        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = style("style_mod0", x, 64)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.bn_axis_name, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        planes = (64, 128, 256, 512)
        in_ch = 64
        for stage, (p, n_blocks) in enumerate(zip(planes, layers)):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = block(p, stride=stride if b == 0 else 1,
                          downsample=(b == 0 and
                                      (stride != 1 or in_ch != p * exp)),
                          groups=groups, base_width=base_width,
                          bn_axis_name=self.bn_axis_name,
                          name=f"layer{stage + 1}_{b}")(x, train)
            in_ch = p * exp
            if stage < 3:
                x = style(f"style_mod{stage + 1}", x, p * exp)
            feats.append(x)
        if return_adain_acts:
            return feats, acts
        return feats


def lateral_channels(arch: str) -> Sequence[int]:
    block, _, _, _ = _ARCHS[ENCODER_ALIASES.get(arch, arch)]
    return tuple(p * block.expansion for p in (64, 128, 256, 512))
