"""Tune the fast test renderer on the real chip: train briefly, then sweep
renderer parameters and report per-frame time at 800^2."""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def main():
    from google_nerf_tpu.core.rays import get_ray_directions, get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.models.render_test_fast import render_test_fast
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=8192, num_epochs=30,
                      samples_budget=131072, random_bg=True)
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style="shell")
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    for i in range(3584):
        if i % 16 == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 2*i+1),
                                     cfg=cfg, warmup=i < cfg.warmup_steps)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, 2*i),
                                          cfg=cfg)
    jax.block_until_ready(state)
    occ_frac = float(jnp.mean(state["occ"].astype(jnp.float32)))
    print(f"trained 3584 steps: psnr={float(metrics['psnr']):.1f} "
          f"s_per_ray={float(metrics['s_per_ray']):.1f} occ={occ_frac:.3f}")

    w = h = 800
    K800 = jnp.asarray([[w * 1.1, 0, w / 2], [0, w * 1.1, h / 2],
                        [0, 0, 1]])
    dirs800 = get_ray_directions(h, w, K800)
    pose = jnp.broadcast_to(jnp.asarray(ds.poses[0]), (h * w, 3, 4))
    rays_o, rays_d = get_rays(dirs800, pose)

    variants = [
        # current default (post resume-fix: overflow windows now resume,
        # so small n_keep forces many rounds on dilated-dense windows)
        dict(chunk=262144, bucket=32768, k=32, n_segs=32, n_keep=8),
        # more segments processed per round
        dict(chunk=262144, bucket=32768, k=64, n_segs=32, n_keep=16),
        dict(chunk=262144, bucket=32768, k=64, n_segs=32, n_keep=24),
        dict(chunk=262144, bucket=32768, k=128, n_segs=64, n_keep=32),
        # wider empty-space windows + more capacity
        dict(chunk=262144, bucket=65536, k=64, n_segs=64, n_keep=16),
        dict(chunk=655360, bucket=65536, k=64, n_segs=64, n_keep=24),
        dict(chunk=655360, bucket=131072, k=64, n_segs=64, n_keep=16),
    ]
    for v in variants:
        def frame():
            return render_test_fast(state["params"], cfg.model,
                                    state["occ_u8"], rays_o, rays_d,
                                    T_threshold=1e-2, **v)["rgb"]
        out = frame()
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [frame() for _ in range(3)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / 3
        mean = float(out.mean())
        print(f"{v}: {dt*1e3:.0f} ms/frame = {1/dt:.2f} FPS "
              f"(mean rgb {mean:.3f})")


if __name__ == "__main__":
    main()
