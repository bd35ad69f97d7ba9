"""cIMLE depth-model training CLI.

TPU-native rebuild of `AdelaiDepth/LeReS/Train/tools/train.py` (and its
v2..v6 variants, selected via --cimle_version as in train_v6/dataparallel):
multi-dataset loading, the every-10-epochs argmin-z recache, SGD +
WarmupMultiStepLR, checkpoint every 8 epochs.

Example (the reference's smoke test, `LeReS/README.md:74-78`):
  python depth_train.py --dataroot datasets --dataset_list demo \\
      --epoch 2 --batchsize 2
"""
from __future__ import annotations

import argparse
import os


def get_args():
    p = argparse.ArgumentParser(description="LeReS-TPU cIMLE training")
    # mirrors Train/tools/parse_arg_base.py
    p.add_argument("--dataroot", default="datasets")
    p.add_argument("--dataset_list", nargs="+", required=True)
    p.add_argument("--batchsize", type=int, default=2)
    p.add_argument("--epoch", type=int, default=50)
    p.add_argument("--base_lr", type=float, default=0.001)
    p.add_argument("--mlp_lr", type=float, default=0.001)
    p.add_argument("--d_latent", type=int, default=32)
    p.add_argument("--cimle_version", default="v2",
                   help="v2=encoder AdaIN; v3..v6=decoder AdaIN")
    p.add_argument("--backbone", default="resnext101",
                   choices=["resnet50", "resnext101", "resnet18"])
    p.add_argument("--loss_mode",
                   default="_ranking-edge_msgil-normal_meanstd-tanh_")
    p.add_argument("--crop_size", type=int, default=448)
    p.add_argument("--out_dir", default="ckpts/depth")
    p.add_argument("--cfg_file", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", default=None,
                   help="checkpoint dir from a previous run (restores "
                        "variables + optimizer + epoch, the reference's "
                        "load_ckpt --resume semantics, net_tools.py:36-60)")
    p.add_argument("--options", nargs="*", default=[],
                   help="KEY VALUE config overrides (TRAIN.BASE_LR 0.01)")
    return p.parse_args()


def main():
    args = get_args()
    import dataclasses

    import jax

    from google_nerf_tpu.depth.config import (DepthCfg, merge_from_file,
                                              merge_from_list)
    from google_nerf_tpu.depth.data import (DepthAnnotationDataset,
                                            MultiDatasetSampler)
    from google_nerf_tpu.depth.trainer import train_depth
    from google_nerf_tpu.utils.ckpt import save_pytree

    backbone = {"resnet50": "resnet50", "resnet18": "resnet18",
                "resnext101": "resnext101_32x8d"}[args.backbone]
    cfg = DepthCfg()
    cfg = dataclasses.replace(
        cfg,
        dataset=dataclasses.replace(cfg.dataset,
                                    crop_size=(args.crop_size,
                                               args.crop_size)),
        model=dataclasses.replace(cfg.model, encoder=backbone,
                                  d_latent=args.d_latent,
                                  cimle_version=args.cimle_version),
        train=dataclasses.replace(cfg.train, base_lr=args.base_lr,
                                  mlp_lr=args.mlp_lr,
                                  batch_size=args.batchsize,
                                  epochs=args.epoch,
                                  loss_mode=args.loss_mode))
    if args.cfg_file:
        cfg = merge_from_file(cfg, args.cfg_file)
    if args.options:
        cfg = merge_from_list(cfg, args.options)

    datasets = [DepthAnnotationDataset(args.dataroot, name,
                                       cfg=cfg.dataset)
                for name in args.dataset_list]
    sampler = MultiDatasetSampler(datasets, seed=args.seed)
    print(f"{len(datasets)} datasets, {len(sampler)} samples/epoch")

    os.makedirs(args.out_dir, exist_ok=True)
    from google_nerf_tpu.utils.ckpt import load_ckpt, save_ckpt

    def ckpt_fn(state, epoch):
        path = os.path.join(args.out_dir, f"epoch{epoch + 1}.npz")
        save_pytree(path, jax.tree.map(lambda x: x, state.variables))
        # resumable checkpoint: variables + optimizer + progress
        save_ckpt(os.path.join(args.out_dir, f"resume_epoch{epoch + 1}"),
                  dict(variables=state.variables,
                       opt_state=state.opt_state,
                       step=state.step, epoch=epoch + 1))
        print(f"saved {path}")

    resume_from = None
    if args.resume:
        from google_nerf_tpu.depth.trainer import init_trainer
        tmpl, _, _ = init_trainer(jax.random.PRNGKey(args.seed), cfg)
        restored = load_ckpt(args.resume,
                             target=dict(variables=tmpl.variables,
                                         opt_state=tmpl.opt_state,
                                         step=0, epoch=0))
        resume_from = restored
        print(f"resumed from {args.resume} (epoch {restored['epoch']})")

    state = train_depth(jax.random.PRNGKey(args.seed), cfg, sampler,
                        ckpt_fn=ckpt_fn, resume=resume_from)
    final = os.path.join(args.out_dir, "final.npz")
    save_pytree(final, state.variables)
    print(f"saved {final}")


if __name__ == "__main__":
    main()
