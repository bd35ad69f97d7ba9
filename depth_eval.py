"""Depth-model benchmark evaluation CLI.

TPU-native rebuild of the reference eval family
(`Train/tools/test_multiauxiv2_nyu.py`, `eval_single*.py`,
`eval_sorted*.py`): evaluate a (cIMLE) depth model on an
annotation-JSON dataset with the full metric battery
(absRel/squaRel/rms/silog/log10/delta1-3/WHDR), optionally with
loss-sorted multi-hypothesis selection (the eval_*_losssorted variants:
keep the best-loss z per image).
"""
from __future__ import annotations

import argparse

import numpy as np


def get_args():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default="datasets")
    p.add_argument("--dataset", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--backbone", default="resnext101",
                   choices=["resnet50", "resnext101", "resnet18"])
    p.add_argument("--load_ckpt", default=None)
    p.add_argument("--d_latent", type=int, default=0)
    p.add_argument("--num_samples", type=int, default=1,
                   help=">1 = cIMLE multi-hypothesis")
    p.add_argument("--select", choices=["first", "loss", "best_metric"],
                   default="first",
                   help="hypothesis selection: first z, argmin train loss "
                        "(eval_*_losssorted), or oracle-best absRel")
    p.add_argument("--crop_size", type=int, default=448)
    p.add_argument("--max_images", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = get_args()
    import jax
    import jax.numpy as jnp

    from google_nerf_tpu.depth.config import DepthCfg
    from google_nerf_tpu.depth.data import DepthAnnotationDataset
    from google_nerf_tpu.depth.losses import LossConfig, depth_losses
    from google_nerf_tpu.depth.metrics import evaluate_rel_err
    from google_nerf_tpu.depth.model import (DepthModelConfig,
                                             depth_forward,
                                             init_depth_model)
    import dataclasses

    backbone = {"resnet50": "resnet50", "resnet18": "resnet18",
                "resnext101": "resnext101_32x8d"}[args.backbone]
    dcfg = dataclasses.replace(DepthCfg().dataset,
                               crop_size=(args.crop_size, args.crop_size))
    ds = DepthAnnotationDataset(args.dataroot, args.dataset,
                                split=args.split, cfg=dcfg)
    mcfg = DepthModelConfig(backbone=backbone, d_latent=args.d_latent)
    variables = init_depth_model(jax.random.PRNGKey(0), mcfg,
                                 dcfg.crop_size)
    if args.load_ckpt:
        if args.load_ckpt.endswith(".pth"):
            from google_nerf_tpu.depth.weights import (
                convert_torch_state_dict, load_torch_checkpoint,
                merge_converted)
            converted, _ = convert_torch_state_dict(
                load_torch_checkpoint(args.load_ckpt))
            variables = merge_converted(variables, converted)
        else:
            from google_nerf_tpu.utils.ckpt import load_pytree
            variables = load_pytree(args.load_ckpt)

    key = jax.random.PRNGKey(args.seed)
    lcfg = LossConfig(loss_mode="_meanstd-tanh_")
    n_imgs = min(len(ds), args.max_images) if args.max_images else len(ds)
    n_z = max(args.num_samples, 1)
    all_metrics = []
    for i in range(n_imgs):
        item = ds.get_val(i)
        rgb = jnp.asarray(item["rgb"])[None]
        gt = np.asarray(item["depth"])
        preds = []
        for k in range(n_z):
            z = (jax.random.normal(jax.random.fold_in(key, i * 100 + k),
                                   (1, args.d_latent))
                 if args.d_latent else None)
            logit = depth_forward(variables, mcfg, rgb, z=z)
            preds.append(np.asarray(logit)[0, ..., 0])
        if args.select == "first" or n_z == 1:
            best = preds[0]
        elif args.select == "loss":
            losses = [float(depth_losses(
                jax.random.fold_in(key, 7),
                jnp.asarray(p)[None],
                {"depth": jnp.asarray(gt)[None],
                 "rgb": rgb}, lcfg)["total_raw"][0]) for p in preds]
            best = preds[int(np.argmin(losses))]
        else:  # oracle best absRel
            errs = [evaluate_rel_err(p, gt).get("err_absRel", np.inf)
                    for p in preds]
            best = preds[int(np.argmin(errs))]
        m = evaluate_rel_err(best, gt)
        if m:
            all_metrics.append(m)
        if i % 20 == 0:
            print(f"image {i}/{n_imgs}")
    agg = {k: round(float(np.mean([m[k] for m in all_metrics])), 4)
           for k in all_metrics[0]} if all_metrics else {}
    print("metrics:", agg)
    return agg


if __name__ == "__main__":
    main()
