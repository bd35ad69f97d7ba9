"""Convergence check of the flagship packed-encoder config on the
procedural synthetic scene (TPU): train N steps, report train PSNR
trajectory + held-out test PSNR."""
import functools
import sys
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def main(steps=3000, encoder="packed"):
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.eval.metrics import psnr
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.models.rendering import render_test
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    model = NGPConfig(scale=0.5, encoder=encoder, grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=64,
                      num_epochs=max(steps // 1000, 1),
                      samples_budget=131072)
    ds = SyntheticDataset(split="train", n_images=64, img_wh=(256, 256))
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    t0 = time.time()
    for i in range(steps):
        if i % cfg.grid_update_interval == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 2*i+1),
                                     cfg=cfg, warmup=i < cfg.warmup_steps)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, 2*i),
                                          cfg=cfg)
        if (i + 1) % 500 == 0:
            print(f"step {i+1}: psnr={float(metrics['psnr']):.2f} "
                  f"s_per_ray={float(metrics['s_per_ray']):.1f} "
                  f"({time.time()-t0:.0f}s)")

    # held-out views
    from google_nerf_tpu.core.rays import get_rays
    ds_test = SyntheticDataset(split="test", n_images=4, img_wh=(256, 256))
    ps = []
    for vi in range(2):
        dirs = jnp.asarray(ds_test.directions)
        pose = jnp.broadcast_to(jnp.asarray(ds_test.poses[vi]),
                                (dirs.shape[0], 3, 4))
        o, d = get_rays(dirs, pose)
        out = render_test(state["params"], cfg.model, state["occ"], o, d)
        gt = jnp.asarray(ds_test.rays[vi])
        p = float(psnr(out["rgb"], gt))
        ps.append(p)
        print(f"test view {vi}: psnr={p:.2f}")
    print(f"mean test psnr: {sum(ps)/len(ps):.2f} "
          f"(total {time.time()-t0:.0f}s)")


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    enc = sys.argv[2] if len(sys.argv) > 2 else "packed"
    main(steps, enc)
