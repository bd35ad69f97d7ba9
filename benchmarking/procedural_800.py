"""800^2 full-protocol benchmark on the procedural scene — the real-data
parity stand-in (VERDICT item 5).

The environment has zero egress, so the NSVF/NeRF-Synthetic archives cannot
be downloaded; this harness runs the EXACT reference protocol — train
`--num_epochs` x 1000 steps x `--batch_size` rays on 100 train views at
800^2, evaluate PSNR/SSIM (+LPIPS when weights provided) on held-out test
views, report training wall-clock and render FPS — on the procedural
analytic scene rendered at the benchmark resolution.  When real data is
mounted, `benchmarking/run_suite.py` runs the same protocol on it.

  python benchmarking/procedural_800.py --num_epochs 10 --batch_size 16384
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_epochs", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=16384)
    p.add_argument("--lr", type=float, default=2e-2)
    p.add_argument("--img_wh", type=int, default=800)
    p.add_argument("--n_train", type=int, default=100)
    p.add_argument("--n_test", type=int, default=8)
    p.add_argument("--style", default="shell", choices=["shell", "solid", "textured"])
    p.add_argument("--k_samples", type=int, default=256)
    p.add_argument("--max_samples", type=int, default=1024,
                   help="train candidate-lattice resolution")
    p.add_argument("--budget", type=int, default=0,
                   help="samples budget (0 = 16*batch_size)")
    p.add_argument("--n_keep", type=int, default=32)
    p.add_argument("--n_keep_sup", type=int, default=24)
    p.add_argument("--exclude", default="backfill",
                   choices=["none", "hard", "floor", "backfill"])
    p.add_argument("--wd", type=float, default=0.0)
    p.add_argument("--encoder", default="packed",
                   choices=["packed", "hash", "freq"])
    p.add_argument("--levels", type=int, default=0,
                   help="override encoder level count (0 = default)")
    p.add_argument("--log2", type=int, default=0,
                   help="override table log2 size (0 = default)")
    p.add_argument("--lpips_weights", default=None)
    p.add_argument("--march", default="block",
                   choices=["seg", "block", "block2", "dense"])
    p.add_argument("--render_max_samples", type=int, default=512)
    p.add_argument("--random_bg", action="store_true",
                   help="train against random background colors (uses the "
                        "procedural gt alpha; kills white-fog floaters)")
    p.add_argument("--out", default="benchmark_procedural800.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.eval.metrics import LPIPS, psnr, ssim
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.models.render_test_oneshot import render_test_oneshot
    from google_nerf_tpu.ops.march_block import pack_occupancy_block2
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    wh = (args.img_wh, args.img_wh)
    print(f"generating {args.n_train} train views at {wh} ...", flush=True)
    t_gen = time.time()
    ds = SyntheticDataset(split="train", n_images=args.n_train, img_wh=wh,
                          style=args.style)
    print(f"  gt generation: {time.time()-t_gen:.0f}s", flush=True)

    enc_kw = {}
    if args.levels:
        enc_kw["packed_levels" if args.encoder == "packed"
               else "num_levels"] = args.levels
    if args.log2:
        enc_kw["packed_log2_size" if args.encoder == "packed"
               else "log2_hashmap_size"] = args.log2
    model = NGPConfig(scale=0.5, encoder=args.encoder, grid_size=128,
                      compute_dtype=jnp.bfloat16, **enc_kw)
    cfg = TrainConfig(model=model, batch_size=args.batch_size,
                      k_samples=args.k_samples, lr=args.lr,
                      max_samples=args.max_samples,
                      num_epochs=args.num_epochs,
                      random_bg=args.random_bg,
                      exclude_incomplete=args.exclude,
                      weight_decay=args.wd,
                      n_keep=args.n_keep, n_keep_sup=args.n_keep_sup,
                      march=args.march,
                      samples_budget=args.budget or 16 * args.batch_size)
    scene = ds.scene(images_uint8=True)
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)

    total_steps = cfg.total_steps
    t0 = time.time()
    for i in range(total_steps):
        if i % cfg.grid_update_interval == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 2*i+1),
                                     cfg=cfg, warmup=i < cfg.warmup_steps)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, 2*i),
                                          cfg=cfg)
        if (i + 1) % 1000 == 0:
            print(f"step {i+1}/{total_steps} "
                  f"psnr={float(metrics['psnr']):.2f} "
                  f"s_per_ray={float(metrics['s_per_ray']):.1f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    # scalar fetch = honest completion bound (timing-audit law)
    _ = float(jax.tree_util.tree_leaves(state)[0].ravel()[0])
    train_time = time.time() - t0
    print(f"train time: {train_time:.0f}s", flush=True)

    test_ds = SyntheticDataset(split="test", n_images=args.n_test,
                               img_wh=wh, style=args.style)
    lp = LPIPS(args.lpips_weights) if args.lpips_weights else None
    dirs = jnp.asarray(test_ds.directions)
    psnrs, ssims, lpipss, times = [], [], [], []
    # serving: compact-main block2 oneshot at the coarser serving lattice
    # (test.py defaults); occ repacked for that lattice
    ms_r = args.render_max_samples
    occ_r = pack_occupancy_block2(jnp.asarray(state["occ"]),
                                  max_samples=ms_r, scale=cfg.model.scale)
    for i in range(args.n_test):
        o, d = get_rays(dirs, jnp.asarray(test_ds.poses[i]))
        t1 = time.time()
        out = render_test_oneshot(state["params"], cfg.model, occ_r, o, d,
                                  T_threshold=1e-2, max_samples=ms_r, k=32,
                                  budget_div=0, straggler_div=2, drain=True,
                                  march="block2", compact_main=True)
        _ = float(out["rgb"][0, 0])
        times.append(time.time() - t1)
        pred = out["rgb"].reshape(wh[1], wh[0], 3)
        gt = jnp.asarray(test_ds.rays[i]).reshape(wh[1], wh[0], 3)
        psnrs.append(float(psnr(pred, gt)))
        ssims.append(float(ssim(pred, gt)))
        if lp is not None and lp.available:
            lpipss.append(float(lp(pred, gt)))
        print(f"test view {i}: psnr={psnrs[-1]:.2f} ssim={ssims[-1]:.4f} "
              f"({times[-1]:.2f}s)", flush=True)

    import numpy as np
    fps = 1.0 / float(np.mean(times[1:] if len(times) > 1 else times))
    result = {
        "scene": f"procedural_{args.style}_{args.img_wh}",
        "protocol": f"{total_steps} steps x {args.batch_size} rays, "
                    f"lr {args.lr}",
        "test_psnr": round(float(np.mean(psnrs)), 2),
        "test_ssim": round(float(np.mean(ssims)), 4),
        "test_lpips": (round(float(np.mean(lpipss)), 4)
                       if lpipss else None),
        "train_time_s": round(train_time, 1),
        "render_fps_800": round(fps, 2),
        "reference_lego": {"psnr": 35.76, "train_time_s": 305,
                           "fps": 36.2, "hardware": "RTX 2080 Ti"},
        "north_star": "lego >=30 PSNR in <300s on one v5e",
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
