"""Fog/oscillation probe: train on the 256^2 synthetic scene logging train
PSNR, held-out PSNR, occupancy fraction and grid-density quantiles over time.

Usage: python tools/fog_probe.py --bg {none,batch,ray} [--steps N]
       [--encoder packed|hash] [--budget B] [--k K]
"""
import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bg", choices=["none", "batch", "ray"], default="ray")
    p.add_argument("--exclude", choices=["none", "hard", "floor", "backfill"],
                   default="floor")
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--encoder", default="packed")
    p.add_argument("--levels", type=int, default=0,
                   help="encoder level-count override (0 = default)")
    p.add_argument("--feats", type=int, default=2)
    p.add_argument("--log2", type=int, default=0,
                   help="table log2-size override (0 = default)")
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--budget", type=int, default=131072)
    p.add_argument("--k", type=int, default=64)
    p.add_argument("--max_samples", type=int, default=1024,
                   help="candidate-lattice resolution (dt = sqrt3/this)")
    p.add_argument("--n_keep", type=int, default=16)
    p.add_argument("--n_keep_sup", type=int, default=12)
    p.add_argument("--style", default="solid")
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--test_every", type=int, default=500)
    p.add_argument("--test_views", type=int, default=4)
    p.add_argument("--tag", default="")
    p.add_argument("--out", default="")
    args = p.parse_args()

    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.eval.metrics import psnr as psnr_fn
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.models.render_test_fast import render_test_fast
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    enc_kw = {}
    if args.levels:
        enc_kw["packed_levels" if args.encoder == "packed"
               else "num_levels"] = args.levels
    if args.log2:
        enc_kw["packed_log2_size" if args.encoder == "packed"
               else "log2_hashmap_size"] = args.log2
    model = NGPConfig(scale=0.5, encoder=args.encoder,
                      packed_features=args.feats,
                      compute_dtype=jnp.bfloat16, **enc_kw)
    cfg = TrainConfig(model=model, batch_size=args.batch, k_samples=args.k,
                      max_samples=args.max_samples,
                      num_epochs=max(args.steps // 1000, 1), lr=args.lr,
                      samples_budget=args.budget,
                      random_bg=args.bg != "none",
                      random_bg_per_ray=args.bg == "ray",
                      exclude_incomplete=args.exclude,
                      weight_decay=args.wd,
                      n_keep=args.n_keep, n_keep_sup=args.n_keep_sup)
    wh = (args.res, args.res)
    ds = SyntheticDataset(split="train", n_images=64, img_wh=wh,
                          style=args.style)
    scene = ds.scene()
    ds_t = SyntheticDataset(split="test", n_images=args.test_views,
                            img_wh=wh, style=args.style)
    dirs_t = jnp.asarray(ds_t.directions)

    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    t0 = time.time()
    rows = []

    def test_psnr(state):
        ps = []
        for vi in range(args.test_views):
            o, d = get_rays(dirs_t, jnp.asarray(ds_t.poses[vi]))
            out = render_test_fast(state["params"], cfg.model,
                                   state["occ_u8"], o, d)
            ps.append(float(psnr_fn(out["rgb"], jnp.asarray(ds_t.rays[vi]))))
        return float(np.mean(ps))

    for i in range(args.steps):
        if i % cfg.grid_update_interval == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 2 * i + 1),
                                     cfg=cfg, warmup=i < cfg.warmup_steps)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, 2 * i),
                                          cfg=cfg)
        s = i + 1
        if s % 100 == 0 or s == args.steps:
            row = dict(step=s, psnr=round(float(metrics["psnr"]), 2),
                       s_per_ray=round(float(metrics["s_per_ray"]), 2),
                       mask=round(float(metrics.get("mask_frac", 1.0)), 3),
                       occ=round(float(jnp.mean(state["occ"])), 4),
                       t=round(time.time() - t0, 1))
            if s % args.test_every == 0 or s == args.steps:
                grid = np.asarray(state["density_grid"])
                pos = grid[grid > 0]
                row["test_psnr"] = round(test_psnr(state), 2)
                row["sigma_q50"] = round(float(np.quantile(pos, .5)), 2)
                row["sigma_q99"] = round(float(np.quantile(pos, .99)), 1)
            rows.append(row)
            print(f"[bg={args.bg} ex={args.exclude} k={args.k}"
                  f" nk={args.n_keep}{args.tag}] " + json.dumps(row))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(dict(args=vars(args), rows=rows), f)


if __name__ == "__main__":
    main()
