"""Time the redesigned (packed encoder + segment march) train step on TPU,
with chained timing (dispatch-proof). Prints component + full-step times."""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def chain_time(step_fn, carry0, n=10, fetch=None):
    c = step_fn(carry0)  # may donate carry0's buffers
    _ = float((fetch(c) if fetch else jax.tree.leaves(c)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        c = step_fn(c)
    _ = float((fetch(c) if fetch else jax.tree.leaves(c)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n, c


def main():
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    for batch, budget, k in [(8192, 131072, 64), (32768, 262144, 64)]:
        model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                          compute_dtype=jnp.bfloat16)
        cfg = TrainConfig(model=model, batch_size=batch, k_samples=k,
                          num_epochs=30, samples_budget=budget)
        ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256))
        scene = ds.scene()
        key = jax.random.PRNGKey(0)
        state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)

        # warm the grid so occupancy is realistic
        for i in range(96):
            if i % cfg.grid_update_interval == 0:
                state = grid_update_step(state, jax.random.fold_in(key, 991 + i),
                                         cfg=cfg, warmup=i < cfg.warmup_steps)
            state, metrics = fused_train_step(
                state, scene, jax.random.fold_in(key, i), cfg=cfg)
        print(f"[batch={batch}] warmed; s_per_ray="
              f"{float(metrics['s_per_ray']):.1f} "
              f"psnr={float(metrics['psnr']):.2f}")

        def step(carry):
            st, i = carry
            st, m = fused_train_step(st, scene, jax.random.fold_in(key, i),
                                     cfg=cfg)
            return (st, i + 1)

        dt, final = chain_time(
            step, (state, jnp.int32(1000)), n=15,
            fetch=lambda c: c[0]["params"]["packed_table"][0, 0])
        state = final[0]
        print(f"[batch={batch}] fused step: {dt*1e3:.1f} ms = "
              f"{batch/dt/1e3:.1f}k rays/s (vs baseline "
              f"{batch/dt/819200:.3f})")

        def gstep(carry):
            st, i = carry
            st = grid_update_step(st, jax.random.fold_in(key, i), cfg=cfg,
                                  warmup=False)
            return (st, i + 1)

        dt, _ = chain_time(gstep, (state, jnp.int32(5000)), n=5,
                           fetch=lambda c: c[0]["density_grid"][0, 0, 0])
        print(f"[batch={batch}] grid update: {dt*1e3:.1f} ms "
              f"(/16 = {dt/16*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
