"""Isolate the train-quality regression: encoder x budget matrix, 1000
steps each on the 256^2 synthetic scene."""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def run(encoder, budget, steps=1000, k_samples=64, lr=1e-2,
        log2_size=16, test_views=0, dtype="bfloat16", max_res=0,
        random_bg=True):
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    model = NGPConfig(scale=0.5, encoder=encoder, grid_size=128,
                      packed_log2_size=log2_size, packed_max_res=max_res,
                      compute_dtype=jnp.dtype(dtype))
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=k_samples,
                      num_epochs=max(steps // 1000, 1), lr=lr,
                      samples_budget=budget, random_bg=random_bg)
    ds = SyntheticDataset(split="train", n_images=64, img_wh=(256, 256))
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    t0 = time.time()
    hist = []
    for i in range(steps):
        if i % cfg.grid_update_interval == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 2*i+1),
                                     cfg=cfg, warmup=i < cfg.warmup_steps)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, 2*i),
                                          cfg=cfg)
        if (i + 1) % 250 == 0:
            hist.append(float(metrics["psnr"]))
            print(f"  [{encoder} b={budget} k={k_samples} "
                  f"T=2^{log2_size}] step {i+1}: "
                  f"psnr={hist[-1]:.2f} "
                  f"s_per_ray={float(metrics['s_per_ray']):.1f} "
                  f"({time.time()-t0:.0f}s)")
    if test_views:
        import numpy as np
        from google_nerf_tpu.core.rays import get_rays
        from google_nerf_tpu.eval.metrics import psnr as psnr_fn
        from google_nerf_tpu.models.rendering import render_test
        grid = np.asarray(state["density_grid"])
        occ_frac = float(np.asarray(state["occ"]).mean())
        print(f"  grid occ={occ_frac:.3f} "
              f"q99={np.quantile(grid[grid>0], .99):.1f}")
        ds_t = SyntheticDataset(split="test", n_images=test_views,
                                img_wh=(256, 256))
        dirs = jnp.asarray(ds_t.directions)
        ps = []
        for vi in range(test_views):
            o, d = get_rays(dirs, jnp.asarray(ds_t.poses[vi]))
            out = render_test(state["params"], cfg.model, state["occ"],
                              o, d)
            ps.append(float(psnr_fn(out["rgb"],
                                    jnp.asarray(ds_t.rays[vi]))))
        print(f"  test psnrs: {[round(p,2) for p in ps]} "
              f"mean={sum(ps)/len(ps):.2f}")
    return hist


if __name__ == "__main__":
    import sys
    configs = [
        ("packed", 0, 64),        # no compaction
        ("hash", 131072, 64),     # old encoder, new compaction
        ("hash", 0, 64),          # old encoder, no compaction
        ("packed", 131072, 128),  # more samples per ray
    ]
    if len(sys.argv) > 1:
        configs = configs[int(sys.argv[1]):int(sys.argv[1]) + 1]
    for enc, b, k in configs:
        run(enc, b, k_samples=k)
