"""ScanNet depth-prior dumper CLI.

TPU-native rebuild of
`AdelaiDepth/LeReS/Train/tools/eval_scannet.py:335-467`: for every frame in
a processed-ScanNet scene's rgb/ directory, run the (cIMLE) depth model
with --num_samples latent hypotheses in minibatches of 5, and write per-
frame, per-hypothesis depth priors:

  <out>/<frame>.npy                (hypothesis 0 / plain model — the prior
                                    `ScannetDataset(depth_dir=...)` consumes)
  <out>/<frame>-sample<k>.npy      (other hypotheses, --all_samples)
  <out>/<frame>-depth_rainbow.png  (visualisation)
  <out>/<frame>-pcd.ply            (point cloud, f=577.870605 as in
                                    `eval_scannet.py:405-406`, --save_ply)

With gt depth present (depth/ dir), also reports the reference's metric
battery (absRel / silog / delta1 / WHDR, `eval_scannet.py:121-257`).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

SCANNET_FOCAL = 577.870605  # eval_scannet.py:405-406


def get_args():
    p = argparse.ArgumentParser(description="dump ScanNet depth priors")
    p.add_argument("--scene_dir", required=True,
                   help="processed scene dir with rgb/ (+optional depth/)")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--backbone", default="resnext101",
                   choices=["resnet50", "resnext101"])
    p.add_argument("--load_ckpt", default=None)
    p.add_argument("--d_latent", type=int, default=32)
    p.add_argument("--num_samples", type=int, default=1,
                   help="cIMLE hypotheses per frame (0/1 = plain model)")
    p.add_argument("--all_samples", action="store_true",
                   help="save every hypothesis, not just the first")
    p.add_argument("--crop_size", type=int, default=448)
    p.add_argument("--save_ply", action="store_true")
    p.add_argument("--save_rainbow", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = get_args()
    import cv2
    import jax
    import jax.numpy as jnp

    from google_nerf_tpu.depth.model import (DepthModelConfig,
                                             depth_inference,
                                             init_depth_model)
    backbone = {"resnet50": "resnet50",
                "resnext101": "resnext101_32x8d"}[args.backbone]
    cimle = args.num_samples > 1 or args.d_latent > 0
    cfg = DepthModelConfig(backbone=backbone,
                           d_latent=args.d_latent if cimle else 0)
    variables = init_depth_model(jax.random.PRNGKey(0), cfg,
                                 (args.crop_size, args.crop_size))
    if args.load_ckpt:
        if args.load_ckpt.endswith(".pth"):
            from google_nerf_tpu.depth.weights import (
                convert_torch_state_dict, load_torch_checkpoint,
                merge_converted)
            converted, skipped = convert_torch_state_dict(
                load_torch_checkpoint(args.load_ckpt))
            print(f"torch ckpt converted ({len(skipped)} skipped)")
            variables = merge_converted(variables, converted)
        else:
            from google_nerf_tpu.utils.ckpt import load_pytree
            variables = load_pytree(args.load_ckpt)

    rgb_dir = os.path.join(args.scene_dir, "rgb")
    depth_dir = os.path.join(args.scene_dir, "depth")
    os.makedirs(args.out_dir, exist_ok=True)
    frames = [os.path.splitext(f)[0] for f in sorted(os.listdir(rgb_dir))
              if f.lower().endswith((".jpg", ".png"))]
    print(f"{len(frames)} frames; num_samples={args.num_samples}")

    key = jax.random.PRNGKey(args.seed)
    n_z = max(args.num_samples, 1)
    metrics_accum = []
    for fi, frame in enumerate(frames):
        path = None
        for ext in (".jpg", ".png"):
            cand = os.path.join(rgb_dir, frame + ext)
            if os.path.exists(cand):
                path = cand
        bgr = cv2.imread(path)
        rgb = bgr[:, :, ::-1].astype(np.float32) / 255.0
        h, w = rgb.shape[:2]
        inp = cv2.resize(rgb, (args.crop_size, args.crop_size))
        # minibatch-of-5 z sets (`eval_scannet.py:374-380`)
        preds = []
        for start in range(0, n_z, 5):
            m = min(5, n_z - start)
            if cfg.d_latent:
                z = jax.random.normal(jax.random.fold_in(key, fi * 100
                                                         + start),
                                      (m, cfg.d_latent))
            else:
                z = None
            batch = jnp.repeat(jnp.asarray(inp)[None], m, axis=0)
            d = np.asarray(depth_inference(variables, cfg, batch, z=z))
            preds.append(d[..., 0])
        preds = np.concatenate(preds)[:n_z]          # (n_z, cs, cs)

        for k in range(n_z if args.all_samples else 1):
            d = cv2.resize(preds[k], (w, h))
            suffix = "" if k == 0 else f"-sample{k}"
            np.save(os.path.join(args.out_dir, frame + suffix + ".npy"), d)
        d0 = cv2.resize(preds[0], (w, h))
        if args.save_rainbow:
            import matplotlib
            dn = (d0 - d0.min()) / max(d0.max() - d0.min(), 1e-8)
            img = (matplotlib.colormaps["rainbow"](dn)[..., :3]
                   * 255).astype(np.uint8)
            cv2.imwrite(os.path.join(args.out_dir,
                                     frame + "-depth_rainbow.png"),
                        img[..., ::-1])
        if args.save_ply:
            from google_nerf_tpu.depth.pointcloud import reconstruct_depth
            reconstruct_depth(d0, (rgb * 255).astype(np.uint8),
                              args.out_dir, frame + "-pcd", SCANNET_FOCAL)
        gt_path = os.path.join(depth_dir, frame + ".png")
        if os.path.isdir(depth_dir) and os.path.exists(gt_path):
            from google_nerf_tpu.depth.metrics import evaluate_rel_err
            gt = cv2.imread(gt_path, cv2.IMREAD_UNCHANGED).astype(
                np.float32) / 1000.0
            if gt.shape != d0.shape:
                gt = cv2.resize(gt, (w, h), interpolation=cv2.INTER_NEAREST)
            m = evaluate_rel_err(d0, gt)
            if m:
                metrics_accum.append(m)
        if fi % 50 == 0:
            print(f"  frame {fi}/{len(frames)}")
    if metrics_accum:
        keys = metrics_accum[0].keys()
        agg = {k: float(np.mean([m[k] for m in metrics_accum]))
               for k in keys}
        print("metrics:", {k: round(v, 4) for k, v in agg.items()})


if __name__ == "__main__":
    main()
