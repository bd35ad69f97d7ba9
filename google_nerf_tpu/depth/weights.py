"""Torch-checkpoint -> flax weight porting for the LeReS depth models.

The reference ships pretrained `res101.pth` (ResNeXt101 encoder + LeReS
decoder, loaded at `Minist_Test/tools/test_depth.py:45-50` via
`load_ckpt`).  This module maps that torch state dict onto the
`google_nerf_tpu.depth` flax variable tree:

  * conv weights OIHW -> HWIO; grouped convs keep group-major O
  * linear weights (out, in) -> (in, out)
  * BatchNorm weight/bias -> params.scale/bias;
    running_mean/var -> batch_stats.mean/var
  * torchvision resnet naming (layerL.B.convN/bnN/downsample.{0,1}) ->
    LateralEncoder naming (layerL_B/ConvBN_N/{Conv_0,BatchNorm_0})
  * LeReS decoder naming (conv.conv_branch.N, ffmK.ftbJ..., outconv
    .adapt_conv.N) -> Decoder naming (FTB fields, AO fields)

Use `convert_torch_state_dict` with a dict of numpy arrays — no torch
import is required (torch .pth loading helper provided separately so the
converter itself stays dependency-free).
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth into {key: np.ndarray} (host-side, torch CPU)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("depth_model", ckpt.get("model_state_dict", ckpt))
    if "state_dict" in state:
        state = state["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


def _strip_prefix(key: str) -> str:
    for p in ("module.", "depth_model.", "model."):
        if key.startswith(p):
            key = key[len(p):]
    return key


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))     # OIHW -> HWIO


_FTB_FIELD = {"conv1": ("conv1", "conv"),
              "conv_branch.1": ("branch_conv1", "conv"),
              "conv_branch.2": ("branch_bn", "bn"),
              "conv_branch.4": ("branch_conv2", "conv")}
_AO_FIELD = {"adapt_conv.0": ("conv1", "conv"),
             "adapt_conv.1": ("bn", "bn"),
             "adapt_conv.3": ("conv2", "conv")}


def _encoder_path(rest: str):
    """torchvision resnet key -> (flax path, kind)."""
    if rest.startswith("conv1."):
        return ("conv1",), "conv"
    if rest.startswith("bn1."):
        return ("bn1",), "bn"
    m = re.match(r"layer(\d)\.(\d+)\.(.*)", rest)
    if not m:
        return None, None
    stage, blk, sub = int(m.group(1)), int(m.group(2)), m.group(3)
    base = (f"layer{stage}_{blk}",)
    if sub.startswith("downsample.0."):
        return base + ("ConvBN_3", "Conv_0"), "conv"
    if sub.startswith("downsample.1."):
        return base + ("ConvBN_3", "BatchNorm_0"), "bn"
    m2 = re.match(r"(conv|bn)(\d)\.", sub)
    if m2:
        n = int(m2.group(2)) - 1
        leaf = "Conv_0" if m2.group(1) == "conv" else "BatchNorm_0"
        return base + (f"ConvBN_{n}", leaf), \
            ("conv" if m2.group(1) == "conv" else "bn")
    # cIMLE AdaIN style mlps: style_modN.mlp.{0,2,4,6}
    m3 = re.match(r"style_mod(\d)\.mlp\.(\d)\.", sub)
    if m3:
        return base, None
    return None, None


def _decoder_path(rest: str):
    m = re.match(r"(conv1|conv|ffm2|ffm1|ffm0|outconv)\.?(.*)", rest)
    if not m:
        return None, None
    head, sub = m.group(1), m.group(2)
    if head == "conv1":
        return ("conv1",), "conv"
    if head == "conv":          # the 1/32 FTB
        for tk, (fk, kind) in _FTB_FIELD.items():
            if sub.startswith(tk + "."):
                return ("conv", fk), kind
    if head in ("ffm2", "ffm1", "ffm0"):
        m2 = re.match(r"(ftb1|ftb2)\.(.*)", sub)
        if m2:
            for tk, (fk, kind) in _FTB_FIELD.items():
                if m2.group(2).startswith(tk + "."):
                    return (head, m2.group(1), fk), kind
    if head == "outconv":
        for tk, (fk, kind) in _AO_FIELD.items():
            if sub.startswith(tk + "."):
                return ("outconv", fk), kind
    return None, None


def convert_torch_state_dict(state: Dict[str, np.ndarray]
                             ) -> Tuple[Dict[str, Any], list]:
    """-> ({"params": ..., "batch_stats": ...} nested dicts, skipped keys).

    Output paths are rooted at encoder/... and decoder/... matching
    `DepthNet` module names."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    skipped = []

    def put(tree, path, leaf, val):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leaf] = val

    for key, val in state.items():
        k = _strip_prefix(key)
        if k.startswith("encoder_modules."):
            rest = k[len("encoder_modules."):]
            path, kind = _encoder_path(rest)
            root = "encoder"
        elif k.startswith("decoder_modules."):
            rest = k[len("decoder_modules."):]
            path, kind = _decoder_path(rest)
            root = "decoder"
        else:
            skipped.append(key)
            continue
        if path is None or kind is None:
            skipped.append(key)
            continue
        leaf_t = k.rsplit(".", 1)[-1]
        full = (root,) + path
        if kind == "conv":
            if leaf_t == "weight":
                put(params, full, "kernel", _conv(val))
            elif leaf_t == "bias":
                put(params, full, "bias", val)
            else:
                skipped.append(key)
        elif kind == "bn":
            if leaf_t == "weight":
                put(params, full, "scale", val)
            elif leaf_t == "bias":
                put(params, full, "bias", val)
            elif leaf_t == "running_mean":
                put(stats, full, "mean", val)
            elif leaf_t == "running_var":
                put(stats, full, "var", val)
            else:
                skipped.append(key)   # num_batches_tracked
        else:
            skipped.append(key)
    return {"params": params, "batch_stats": stats}, skipped


def validate_against(variables, converted) -> list:
    """Compare a converted tree against `init_depth_model` output; returns
    a list of problems (missing keys / shape mismatches)."""
    import jax
    problems = []

    ref_flat = _flatten(variables.get("params", {}))
    got_flat = _flatten(converted.get("params", {}))
    for k, v in ref_flat.items():
        if k not in got_flat:
            problems.append(f"missing param {'/'.join(k)}")
        elif tuple(np.shape(got_flat[k])) != tuple(v.shape):
            problems.append(
                f"shape mismatch {'/'.join(k)}: "
                f"{np.shape(got_flat[k])} vs {tuple(v.shape)}")
    for k in got_flat:
        if k not in ref_flat:
            problems.append(f"unexpected param {'/'.join(k)}")
    return problems


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def merge_converted(variables, converted):
    """Overlay converted params/batch_stats onto an init tree (keeps any
    collections the checkpoint does not provide, e.g. adain_stats)."""
    import flax
    out = flax.core.unfreeze(variables) if hasattr(
        variables, "unfreeze") else dict(variables)
    for coll in ("params", "batch_stats"):
        if coll not in converted or coll not in out:
            continue
        dst = _flatten(out[coll])
        src = _flatten(converted[coll])
        merged = {k: np.asarray(src.get(k, v)) for k, v in dst.items()}
        out[coll] = flax.traverse_util.unflatten_dict(merged)
    return out
