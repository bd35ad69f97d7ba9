"""Single-image depth inference CLI.

TPU-native rebuild of
`AdelaiDepth/LeReS/Minist_Test/tools/test_depth.py:40-78`: for each image in
--img_dir, resize to 448x448, ImageNet-normalise, run RelDepthModel
inference (depth - min + 0.01), resize back, and save a rainbow-colormapped
png plus a 16-bit png scaled by 60000/max.

Checkpoints: --load_ckpt accepts either a torch .pth (converted on the fly
via depth/weights.py) or an orbax/npz dump produced by depth_train.py.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def get_args():
    p = argparse.ArgumentParser(description="LeReS-TPU depth inference")
    p.add_argument("--img_dir", required=True)
    p.add_argument("--out_dir", default="outputs_depth")
    p.add_argument("--backbone", default="resnext101",
                   choices=["resnet50", "resnext101"])
    p.add_argument("--load_ckpt", default=None,
                   help=".pth (torch) or .npz (native) checkpoint")
    p.add_argument("--crop_size", type=int, default=448)
    p.add_argument("--save_ply", action="store_true",
                   help="also reconstruct point clouds (test_shape.py path)")
    p.add_argument("--focal", type=float, default=1386.0,
                   help="focal length for --save_ply reconstruction")
    return p.parse_args()


def load_variables(args, cfg):
    import jax
    from google_nerf_tpu.depth.model import init_depth_model
    variables = init_depth_model(jax.random.PRNGKey(0), cfg,
                                 (args.crop_size, args.crop_size))
    if args.load_ckpt:
        if args.load_ckpt.endswith(".pth"):
            from google_nerf_tpu.depth.weights import (
                convert_torch_state_dict, load_torch_checkpoint,
                merge_converted)
            state = load_torch_checkpoint(args.load_ckpt)
            converted, skipped = convert_torch_state_dict(state)
            print(f"converted torch ckpt ({len(skipped)} keys skipped)")
            variables = merge_converted(variables, converted)
        else:
            from google_nerf_tpu.utils.ckpt import load_pytree
            variables = load_pytree(args.load_ckpt)
    return variables


def colorize_rainbow(depth):
    """Match plt.imsave(cmap='rainbow') output range."""
    import matplotlib
    d = (depth - depth.min()) / max(depth.max() - depth.min(), 1e-8)
    return (matplotlib.colormaps["rainbow"](d)[..., :3] * 255).astype(
        np.uint8)


def main():
    args = get_args()
    import cv2
    import jax.numpy as jnp

    from google_nerf_tpu.depth.model import (DepthModelConfig,
                                             depth_inference)
    backbone = {"resnet50": "resnet50",
                "resnext101": "resnext101_32x8d"}[args.backbone]
    cfg = DepthModelConfig(backbone=backbone)
    variables = load_variables(args, cfg)
    os.makedirs(args.out_dir, exist_ok=True)

    names = [f for f in sorted(os.listdir(args.img_dir))
             if f.lower().endswith((".jpg", ".png", ".jpeg"))]
    print(f"{len(names)} images")
    for name in names:
        bgr = cv2.imread(os.path.join(args.img_dir, name))
        rgb = bgr[:, :, ::-1].astype(np.float32) / 255.0
        h, w = rgb.shape[:2]
        inp = cv2.resize(rgb, (args.crop_size, args.crop_size),
                         interpolation=cv2.INTER_LINEAR)
        depth = np.asarray(depth_inference(
            variables, cfg, jnp.asarray(inp[None])))[0, ..., 0]
        depth = cv2.resize(depth, (w, h))
        base = os.path.splitext(name)[0]
        try:
            cv2.imwrite(os.path.join(args.out_dir, base + "-depth_rainbow.png"),
                        colorize_rainbow(depth)[..., ::-1])
        except ImportError:
            pass
        d16 = (depth / max(depth.max(), 1e-8) * 60000).astype(np.uint16)
        cv2.imwrite(os.path.join(args.out_dir, base + "-depth.png"), d16)
        if args.save_ply:
            from google_nerf_tpu.depth.pointcloud import reconstruct_depth
            reconstruct_depth(depth, (rgb * 255).astype(np.uint8),
                              args.out_dir, base + "-pcd", args.focal)
        print(f"  {name}: depth range [{depth.min():.3f}, {depth.max():.3f}]")


if __name__ == "__main__":
    main()
