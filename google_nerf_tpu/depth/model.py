"""LeReS depth models: plain, auxiliary-branch, and cIMLE variants.

TPU-native rebuild of
`AdelaiDepth/LeReS/Minist_Test/lib/multi_depth_model_woauxi.py:7-34` (plain
inference model), `Train/lib/models/multi_depth_model_auxiv2.py:480-520`
(train model with auxi branch) and `:487-563` (cIMLE encoder/decoder
variants).

API is functional: `DepthNet` is a flax module; `init_depth_model` /
`depth_inference` wrap it for the common cases.  `variables` carries
collections {params, batch_stats, adain_stats}.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from google_nerf_tpu.depth.backbones import LateralEncoder
from google_nerf_tpu.depth.decoder import AuxiNetV2, Decoder

# ImageNet normalisation used by every LeReS CLI
# (`Minist_Test/tools/test_depth.py:31-33`: mean (0.485,0.456,0.406),
# std (0.229,0.224,0.225))
RGB_MEAN = (0.485, 0.456, 0.406)
RGB_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class DepthModelConfig:
    backbone: str = "resnext101_32x8d"   # or resnet50 (test CLIs) etc.
    d_latent: int = 0                    # >0 enables cIMLE
    cimle_site: str = "encoder"          # "encoder" (v2) | "decoder" (v3+)
    with_auxi: bool = False              # train-time disparity branch
    bn_axis_name: Optional[str] = None


class DepthNet(nn.Module):
    """Encoder laterals -> decoder logit (+ optional auxi disparity)."""
    cfg: DepthModelConfig = DepthModelConfig()

    @nn.compact
    def __call__(self, rgb, z=None, train: bool = False,
                 return_adain_acts: bool = False):
        c = self.cfg
        enc_latent = c.d_latent if c.cimle_site == "encoder" else 0
        dec_latent = c.d_latent if c.cimle_site == "decoder" else 0
        enc = LateralEncoder(c.backbone, d_latent=enc_latent,
                             bn_axis_name=c.bn_axis_name, name="encoder")
        if enc_latent:
            out = enc(rgb, z, train=train,
                      return_adain_acts=return_adain_acts)
            feats, acts = out if return_adain_acts else (out, None)
        else:
            feats, acts = enc(rgb, train=train), None
        dec = Decoder(d_latent=dec_latent, bn_axis_name=c.bn_axis_name,
                      name="decoder")
        if c.with_auxi:
            logit, auxi_in = dec(feats, train=train, z=z,
                                 return_auxi_input=True)
            auxi = AuxiNetV2(bn_axis_name=c.bn_axis_name,
                             name="auxi")(auxi_in, train=train)
            if return_adain_acts:
                return (logit, auxi), acts
            return logit, auxi
        logit = dec(feats, train=train, z=z)
        if return_adain_acts:
            return logit, acts
        return logit


def init_depth_model(key, cfg: DepthModelConfig,
                     input_hw=(448, 448)) -> Dict[str, Any]:
    """Initialise all variable collections with a dummy batch."""
    model = DepthNet(cfg)
    rgb = jnp.zeros((1,) + tuple(input_hw) + (3,))
    z = jnp.zeros((1, cfg.d_latent)) if cfg.d_latent else None
    return model.init(key, rgb, z=z, train=False)


def normalize_rgb(rgb01):
    """(..., 3) float RGB in [0,1] -> ImageNet-normalised."""
    return (rgb01 - jnp.asarray(RGB_MEAN)) / jnp.asarray(RGB_STD)


def depth_forward(variables, cfg: DepthModelConfig, rgb, z=None,
                  train: bool = False):
    """Raw logit(s).  rgb: (B, H, W, 3) already normalised."""
    model = DepthNet(cfg)
    if train:
        out, updates = model.apply(variables, rgb, z=z, train=True,
                                   mutable=["batch_stats"])
        return out, updates
    return model.apply(variables, rgb, z=z, train=False)


def depth_inference(variables, cfg: DepthModelConfig, rgb01, z=None):
    """`RelDepthModel.inference` semantics
    (`multi_depth_model_woauxi.py:16-21`): normalise, forward, then
    `depth - depth.min() + 0.01`."""
    rgb = normalize_rgb(rgb01)
    out = depth_forward(variables, cfg, rgb, z=z, train=False)
    logit = out[0] if cfg.with_auxi else out
    return logit - logit.min() + 0.01


def get_adain_init_act(variables, cfg: DepthModelConfig, rgb, z):
    """Per-injection-point AdaIN activations for calibration
    (`Train/lib/models/multi_depth_model_auxiv2.py:113-117`)."""
    model = DepthNet(cfg)
    _, acts = model.apply(variables, rgb, z=z, train=False,
                          return_adain_acts=True)
    return acts


def set_mean_var_shifts(variables, means, variances):
    """Write AdaIN calibration shifts (`Resnext_torch.py:464-476`).

    means/variances: lists of (C,) arrays, one per AdaIN point in order
    style_mod0..style_mod3.  Returns updated variables pytree.
    """
    import flax
    flat = flax.traverse_util.flatten_dict(variables["adain_stats"])
    # keys look like ('encoder', 'style_mod0', 'mean_shift')
    by_site = sorted({k[:-1] for k in flat})
    assert len(by_site) == len(means) == len(variances)
    for site, m, v in zip(by_site, means, variances):
        flat[site + ("mean_shift",)] = jnp.asarray(m)
        flat[site + ("var_shift",)] = jnp.asarray(v)
    new_stats = flax.traverse_util.unflatten_dict(flat)
    out = dict(variables)
    out["adain_stats"] = new_stats
    return out
