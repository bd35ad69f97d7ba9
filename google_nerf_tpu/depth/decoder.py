"""LeReS top-down decoder blocks (FTB / ATA / FFM / AO) + auxiliary head.

TPU-native rebuild of `AdelaiDepth/LeReS/Minist_Test/lib/network_auxi.py`:
  * FTB (feature transfer block, `:100-144`): 3x3 conv then a residual
    conv-BN-relu-conv branch.
  * ATA (adaptive channel attention, `:147-188`): squeeze-excite over the
    concat of low/high features (kept for parity; the decoder itself does
    not call it, matching the commented-out reference call site `:205`).
  * FFM (feature fusion module, `:191-235`): FTB -> add skip -> FTB ->
    bilinear 2x upsample.
  * AO (adaptive output, `:238-281`): conv-BN-relu-conv -> 2x upsample to
    full resolution, 1 channel.
  * Decoder (`:15-62`): 1/32 FTB + conv, then FFM at 1/16, 1/8, 1/4, AO.
  * AuxiNetV2 (`Train/lib/models/network_auxi.py:77-172`): the disparity
    auxiliary branch fed from decoder intermediates.
  * Decoder_cIMLE (`Train/lib/models/network_auxi.py:319-566`): decoder-side
    AdaIN latent injection at the four scales.

Everything is NHWC; bilinear upsampling uses `jax.image.resize` with
half-pixel alignment disabled to match torch's align_corners=True.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from google_nerf_tpu.depth.adain import AdaInMod


def upsample_bilinear(x, factor: int):
    """NHWC bilinear x`factor`, torch align_corners=True semantics."""
    b, h, w, c = x.shape
    nh, nw = h * factor, w * factor
    if h == 1 and w == 1:
        return jnp.broadcast_to(x, (b, nh, nw, c))
    # align_corners=True: output grid linearly spans [0, h-1]
    ys = jnp.linspace(0.0, h - 1.0, nh)
    xs = jnp.linspace(0.0, w - 1.0, nw)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 2)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 2)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = x[:, y0][:, :, x0]          # (b, nh, nw, c) corner 00
    g01 = x[:, y0][:, :, x0 + 1]
    g10 = x[:, y0 + 1][:, :, x0]
    g11 = x[:, y0 + 1][:, :, x0 + 1]
    top = g * (1 - wx) + g01 * wx
    bot = g10 * (1 - wx) + g11 * wx
    return top * (1 - wy) + bot * wy


class FTB(nn.Module):
    """Feature transfer block (`network_auxi.py:100-144`)."""
    mid: int
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.mid, (3, 3), padding=1, name="conv1")(x)
        br = nn.Conv(self.mid, (3, 3), padding=1, name="branch_conv1")(
            nn.relu(x))
        br = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          axis_name=self.bn_axis_name, name="branch_bn")(br)
        br = nn.Conv(self.mid, (3, 3), padding=1,
                     name="branch_conv2")(nn.relu(br))
        return nn.relu(x + br)


class ATA(nn.Module):
    """Adaptive channel attention (`network_auxi.py:147-188`)."""
    channels: int
    reduction: int = 8

    @nn.compact
    def __call__(self, low, high):
        x = jnp.concatenate([low, high], axis=-1)
        x = jnp.mean(x, axis=(1, 2))                    # squeeze
        x = nn.relu(nn.Dense(self.channels // self.reduction)(x))
        x = nn.sigmoid(nn.Dense(self.channels)(x))
        return low * x[:, None, None, :] + high


class FFM(nn.Module):
    """Feature fusion module (`network_auxi.py:191-235`)."""
    mid: int
    out: int
    upfactor: int = 2
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, low, high, train: bool):
        x = FTB(self.mid, self.bn_axis_name, name="ftb1")(low, train)
        x = x + high
        x = FTB(self.out, self.bn_axis_name, name="ftb2")(x, train)
        return upsample_bilinear(x, self.upfactor)


class AO(nn.Module):
    """Adaptive output head (`network_auxi.py:238-281`)."""
    out: int = 1
    upfactor: int = 2
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool):
        c = x.shape[-1]
        x = nn.Conv(c // 2, (3, 3), padding=1, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         axis_name=self.bn_axis_name, name="bn")(x)
        x = nn.Conv(self.out, (3, 3), padding=1, name="conv2")(nn.relu(x))
        return upsample_bilinear(x, self.upfactor)


class Decoder(nn.Module):
    """Top-down decoder (`network_auxi.py:15-62`).

    features: laterals [1/4(256ch), 1/8(512), 1/16(1024), 1/32(2048)].
    Returns the full-resolution 1-channel logit; with `return_auxi_input`
    also the list of pre-fusion intermediates the AuxiNet consumes
    (`Train/lib/models/network_auxi.py:231` returns (x, auxi_input)).
    With `d_latent > 0` an AdaIN modulator conditions each scale on z
    (decoder-cIMLE, `Train/lib/models/network_auxi.py:319-566`).
    """
    midchannels: Sequence[int] = (256, 256, 256, 512)
    d_latent: int = 0
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, features, train: bool = False, z=None,
                 return_auxi_input: bool = False):
        mc = self.midchannels

        def style(name, h, channels):
            if self.d_latent <= 0:
                return h
            return AdaInMod(self.d_latent, channels, name=name)(h, z)

        x32x = FTB(mc[3], self.bn_axis_name, name="conv")(features[3], train)
        x32 = nn.Conv(mc[2], (3, 3), padding=1, name="conv1")(x32x)
        x32 = style("style_mod3", x32, mc[2])
        x16 = upsample_bilinear(x32, 2)

        auxi_input = [x32x]
        x8 = FFM(mc[2], mc[2], 2, self.bn_axis_name,
                 name="ffm2")(style("style_mod2", features[2],
                                    features[2].shape[-1]), x16, train)
        x4 = FFM(mc[1], mc[1], 2, self.bn_axis_name,
                 name="ffm1")(style("style_mod1", features[1],
                                    features[1].shape[-1]), x8, train)
        x2 = FFM(mc[0], mc[0], 2, self.bn_axis_name,
                 name="ffm0")(style("style_mod0", features[0],
                                    features[0].shape[-1]), x4, train)
        auxi_input += [x8, x4, x2]
        x = AO(1, 2, self.bn_axis_name, name="outconv")(x2, train)
        if return_auxi_input:
            return x, auxi_input
        return x


class AuxiNetV2(nn.Module):
    """Auxiliary disparity branch (`Train/lib/models/network_auxi.py:126-172`):
    per-scale FTBs fused bottom-up, then an AO head -> 1-channel disp."""
    mid: int = 256
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, auxi_input, train: bool = False):
        x32, x8, x4, x2 = auxi_input
        x = FTB(self.mid, self.bn_axis_name, name="ftb32")(x32, train)
        x = upsample_bilinear(x, 4)
        x = x + FTB(self.mid, self.bn_axis_name, name="ftb8")(x8, train)
        x = upsample_bilinear(x, 2)
        x = x + FTB(self.mid, self.bn_axis_name, name="ftb4")(x4, train)
        x = upsample_bilinear(x, 2)
        x = x + FTB(self.mid, self.bn_axis_name, name="ftb2")(x2, train)
        return AO(1, 2, self.bn_axis_name, name="out")(x, train)
