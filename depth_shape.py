"""Single-image 3-D shape recovery CLI (focal + shift refinement).

TPU-native rebuild of
`AdelaiDepth/LeReS/Minist_Test/tools/test_shape.py:59-157`: run the LeReS
depth net on each image, normalise the depth (-min + 0.5, /p98), then the
reference's three-step refinement — focal (SPVCNN 5ch) -> shift (SPVCNN
3ch, clamp 0.6) -> focal again — and save the shifted depth plus a PLY
point cloud reconstructed with the recovered focal length.

Checkpoints: --load_ckpt accepts the reference's bundled .pth (keys
`depth_model` / `shift_model` / `focal_model`, `net_tools.load_ckpt:27-41`)
— depth weights convert via depth/weights.py, the SPVCNN heads via
depth/spvcnn.convert_spvcnn_state_dict.  Without a checkpoint the heads
run at random init (shape-correct smoke mode).
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def get_args():
    p = argparse.ArgumentParser(description="LeReS-TPU shape recovery")
    p.add_argument("--img_dir", required=True)
    p.add_argument("--out_dir", default="outputs_shape")
    p.add_argument("--backbone", default="resnext101",
                   choices=["resnet50", "resnext101"])
    p.add_argument("--load_ckpt", default=None)
    p.add_argument("--crop_size", type=int, default=448)
    return p.parse_args()


def _strip(d, prefix="module."):
    return {(k[len(prefix):] if k.startswith(prefix) else k): v
            for k, v in d.items()}


def reconstruct3d_from_depth(rgb, pred_depth, shift_params, focal_params):
    """`test_shape.reconstruct3D_from_depth:59-85` semantics."""
    from google_nerf_tpu.depth.spvcnn import (refine_focal_spvcnn,
                                              refine_shift_spvcnn)
    u0 = rgb.shape[1] / 2.0
    v0 = rgb.shape[0] / 2.0
    dn = pred_depth - pred_depth.min() + 0.5
    dn = dn / np.percentile(dn, 98)
    focal = rgb.shape[0] // 2 / np.tan((60 / 2.0) * np.pi / 180)

    s1 = refine_focal_spvcnn(dn, focal_params, focal, u0, v0)
    focal = focal / max(s1, 1e-3)
    shift = refine_shift_spvcnn(dn, shift_params, focal, u0, v0)
    shift = min(shift, 0.6)
    d_shifted = dn - shift
    s2 = refine_focal_spvcnn(d_shifted, focal_params, focal, u0, v0)
    focal = focal / max(s2, 1e-3)
    return shift, focal, d_shifted


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp

    from google_nerf_tpu.depth.model import (DepthModelConfig,
                                             depth_inference,
                                             init_depth_model)
    from google_nerf_tpu.depth.pointcloud import reconstruct_depth
    from google_nerf_tpu.depth.spvcnn import (convert_spvcnn_state_dict,
                                              init_spvcnn)

    backbone = {"resnet50": "resnet50",
                "resnext101": "resnext101_32x8d"}[args.backbone]
    cfg = DepthModelConfig(backbone=backbone)
    variables = init_depth_model(jax.random.PRNGKey(0), cfg,
                                 (args.crop_size, args.crop_size))
    shift_params = init_spvcnn(jax.random.PRNGKey(1), input_channel=3)
    focal_params = init_spvcnn(jax.random.PRNGKey(2), input_channel=5)
    if args.load_ckpt:
        from google_nerf_tpu.depth.weights import (convert_torch_state_dict,
                                                   merge_converted)
        import torch
        raw = torch.load(args.load_ckpt, map_location="cpu",
                         weights_only=False)
        if "depth_model" in raw:
            converted, _ = convert_torch_state_dict(
                {k: np.asarray(v) for k, v in
                 _strip(raw["depth_model"]).items()})
            variables = merge_converted(variables, converted)
        if "shift_model" in raw:
            shift_params = convert_spvcnn_state_dict(
                {k: np.asarray(v) for k, v in
                 _strip(raw["shift_model"]).items()})
        if "focal_model" in raw:
            focal_params = convert_spvcnn_state_dict(
                {k: np.asarray(v) for k, v in
                 _strip(raw["focal_model"]).items()})

    import cv2
    os.makedirs(args.out_dir, exist_ok=True)
    names = sorted(os.listdir(args.img_dir))
    for name in names:
        path = os.path.join(args.img_dir, name)
        bgr = cv2.imread(path)
        if bgr is None:
            continue
        print(f"processing {name}")
        rgb01 = bgr[:, :, ::-1].astype(np.float32) / 255.0
        h, w = rgb01.shape[:2]
        inp = cv2.resize(rgb01, (args.crop_size, args.crop_size),
                         interpolation=cv2.INTER_LINEAR)
        depth = np.asarray(depth_inference(
            variables, cfg, jnp.asarray(inp[None])))[0, ..., 0]
        depth = cv2.resize(depth, (w, h))
        rgb = (rgb01 * 255).astype(np.uint8)
        shift, focal, d_shifted = reconstruct3d_from_depth(
            rgb, depth, shift_params, focal_params)
        base = os.path.splitext(name)[0]
        d16 = (np.maximum(d_shifted, 0.0)
               / max(d_shifted.max(), 1e-8) * 60000.0)
        cv2.imwrite(os.path.join(args.out_dir, base + "-depth_shifted.png"),
                    d16.astype(np.uint16))
        reconstruct_depth(d_shifted, rgb, args.out_dir, base + "-pcd",
                          focal=focal)
        print(f"  shift={shift:.4f} focal={focal:.1f}")


if __name__ == "__main__":
    main()
