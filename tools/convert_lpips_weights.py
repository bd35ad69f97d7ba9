"""Convert LPIPS-vgg weights (torch) to the .npz consumed by
google_nerf_tpu.eval.metrics.LPIPS.

Accepts either:
  * the `lpips` pip package's checkpoint layout: a combined state dict with
    `net.slice{1..5}.{i}.weight/bias` (VGG16 features) and
    `lin{0..4}.model.1.weight` (linear calibration heads), or the pair of
    torchvision vgg16 (`features.{i}.weight/bias`) + lpips linear-heads
    checkpoint (`lin{j}.model.1.weight`), passed as --vgg/--lin;
  * an already-merged dict with conv{i}_w naming (passthrough).

Output .npz keys: conv{0..12}_w (OIHW), conv{0..12}_b, lin{0..4}_w
(1, C, 1, 1).

Usage:
  python tools/convert_lpips_weights.py --lpips_ckpt /path/lpips_vgg.pth \
      --out lpips_vgg.npz
  python tools/convert_lpips_weights.py --auto --out lpips_vgg.npz
      (--auto instantiates lpips.LPIPS(net='vgg') — needs the pip package
       and its cached weights)
"""
from __future__ import annotations

import argparse
import re

import numpy as np

# torchvision vgg16 `features` indices of the 13 conv layers
_VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def convert_state_dict(state) -> dict:
    """torch-key dict (numpy arrays) -> npz dict with conv{i}_w naming."""
    out = {}
    conv_i = 0
    # vgg via lpips package: net.slice{s}.{idx}.weight, idx global over
    # torchvision features
    vgg_items = {}
    for k, v in state.items():
        m = re.match(r"(?:net\.)?slice\d\.(\d+)\.(weight|bias)", k)
        if m:
            vgg_items[(int(m.group(1)), m.group(2))] = v
        m = re.match(r"features\.(\d+)\.(weight|bias)", k)
        if m:
            vgg_items[(int(m.group(1)), m.group(2))] = v
    for conv_i, idx in enumerate(_VGG16_CONV_IDX):
        if (idx, "weight") in vgg_items:
            out[f"conv{conv_i}_w"] = np.asarray(vgg_items[(idx, "weight")])
            out[f"conv{conv_i}_b"] = np.asarray(vgg_items[(idx, "bias")])
    for k, v in state.items():
        m = re.match(r"lin(\d)\.model\.1\.weight", k)
        if m:
            out[f"lin{int(m.group(1))}_w"] = np.asarray(v)
        m = re.match(r"lins\.(\d)\.model\.1\.weight", k)
        if m:
            out[f"lin{int(m.group(1))}_w"] = np.asarray(v)
    # passthrough for already-converted dicts
    for k, v in state.items():
        if re.match(r"(conv\d+_[wb]|lin\d_w)$", k):
            out[k] = np.asarray(v)
    return out


def validate(out: dict):
    problems = []
    widths = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    for i, w in enumerate(widths):
        if f"conv{i}_w" not in out:
            problems.append(f"missing conv{i}_w")
        elif out[f"conv{i}_w"].shape[0] != w:
            problems.append(f"conv{i}_w out-channels "
                            f"{out[f'conv{i}_w'].shape[0]} != {w}")
    for j, c in enumerate((64, 128, 256, 512, 512)):
        if f"lin{j}_w" not in out:
            problems.append(f"missing lin{j}_w")
        elif out[f"lin{j}_w"].reshape(-1).shape[0] != c:
            problems.append(f"lin{j}_w has {out[f'lin{j}_w'].size} != {c}")
    return problems


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lpips_ckpt", default=None,
                   help="combined lpips state dict (.pth)")
    p.add_argument("--vgg", default=None, help="torchvision vgg16 .pth")
    p.add_argument("--lin", default=None, help="lpips linear heads .pth")
    p.add_argument("--auto", action="store_true",
                   help="instantiate lpips.LPIPS(net='vgg')")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    state = {}
    if args.auto:
        import lpips
        model = lpips.LPIPS(net="vgg")
        state = {k: v.detach().cpu().numpy()
                 for k, v in model.state_dict().items()}
    else:
        import torch
        for path in (args.lpips_ckpt, args.vgg, args.lin):
            if path:
                d = torch.load(path, map_location="cpu", weights_only=False)
                d = d.get("state_dict", d)
                state.update({k: v.detach().cpu().numpy()
                              for k, v in d.items() if hasattr(v, "cpu")})
    out = convert_state_dict(state)
    problems = validate(out)
    if problems:
        raise SystemExit("conversion incomplete: " + "; ".join(problems))
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
