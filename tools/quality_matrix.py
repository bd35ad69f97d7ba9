"""Isolate the train-quality regression: encoder x budget matrix, 1000
steps each on the 256^2 synthetic scene."""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def run(encoder, budget, steps=1000, k_samples=64, lr=1e-2):
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    model = NGPConfig(scale=0.5, encoder=encoder, grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=k_samples,
                      num_epochs=30, lr=lr, samples_budget=budget)
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
            print(f"  [{encoder} b={budget} k={k_samples}] step {i+1}: "
                  f"psnr={hist[-1]:.2f} "
                  f"s_per_ray={float(metrics['s_per_ray']):.1f} "
                  f"({time.time()-t0:.0f}s)")
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
