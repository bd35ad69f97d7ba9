"""A/B: training rays/s/chip vs (batch_size, samples_budget) at the flagship
block-march config — does scaling the ray batch amortize fixed overheads, and
how much does tightening the per-ray sample budget buy?

Each variant costs a fresh remote compile (minutes); keep the list short.
Prints one line per variant + a quality signal (train PSNR after the same
number of RAYS, not steps, so variants see equal supervision).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def run_variant(batch_size: int, budget: int, *, rays_total: int = 2 ** 23):
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=batch_size, k_samples=256,
                      num_epochs=30, samples_budget=budget, random_bg=True,
                      exclude_incomplete="backfill", march="block")
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256))
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)

    n_steps = rays_total // batch_size
    warm = max(256, n_steps // 8)
    n_steps = max(n_steps, warm + 64)

    def loop(state, lo, hi):
        for i in range(lo, hi):
            if i % cfg.grid_update_interval == 0:
                state = grid_update_step(
                    state, jax.random.fold_in(key, 2 * i + 1), cfg=cfg,
                    warmup=i < cfg.warmup_steps)
            state, metrics = fused_train_step(
                state, scene, jax.random.fold_in(key, 2 * i), cfg=cfg)
        jax.block_until_ready(state)
        return state, metrics

    t0 = time.time()
    state, m = loop(state, 0, warm)
    t_compile_warm = time.time() - t0

    t0 = time.time()
    state, m = loop(state, warm, n_steps)
    dt = time.time() - t0
    rps = (n_steps - warm) * batch_size / dt
    print(f"batch={batch_size:6d} budget={budget:7d}: "
          f"{dt / (n_steps - warm) * 1e3:6.1f} ms/step  "
          f"{rps:,.0f} rays/s ({rps / 819200:.3f}x)  "
          f"psnr={float(m['psnr']):.2f} s_per_ray={float(m['s_per_ray']):.1f}"
          f"  [warm+compile {t_compile_warm:.0f}s]")


def main():
    variants = [(8192, 131072), (16384, 262144), (16384, 196608),
                (32768, 393216)]
    if len(sys.argv) > 1:  # e.g. "16384:262144,32768:524288"
        variants = [tuple(int(x) for x in v.split(":"))
                    for v in sys.argv[1].split(",")]
    for b, bud in variants:
        run_variant(b, bud)
    print("DONE")


if __name__ == "__main__":
    main()
