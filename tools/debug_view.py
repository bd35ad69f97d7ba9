"""Diagnose the bad-test-view artifact: train, dump per-view renders
(rgb/depth/opacity) + density-grid statistics + per-view train-pose
distance."""
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def main(steps=3000):
    import imageio.v2 as imageio

    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.eval.metrics import psnr
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.models.rendering import render_test
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)
    from google_nerf_tpu.utils.ckpt import save_pytree

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=64,
                      num_epochs=30, samples_budget=131072)
    ds = SyntheticDataset(split="train", n_images=64, img_wh=(256, 256))
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    for i in range(steps):
        if i % 16 == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 2*i+1),
                                     cfg=cfg, warmup=i < cfg.warmup_steps)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, 2*i),
                                          cfg=cfg)
    jax.block_until_ready(state)
    print(f"train psnr {float(metrics['psnr']):.2f}")

    grid = np.asarray(state["density_grid"])
    pos = grid[grid > 0]
    print(f"grid: occ_frac={(np.asarray(state['occ'])).mean():.3f} "
          f"pos_cells={pos.size/grid.size:.3f} mean_pos={pos.mean():.3f} "
          f"q50={np.quantile(pos, .5):.4f} q90={np.quantile(pos, .9):.3f} "
          f"q99={np.quantile(pos, .99):.2f} max={pos.max():.1f}")
    thr = min(pos.mean(), 0.01 * 1024 / 3 ** 0.5)
    print(f"threshold used: {thr:.4f}")

    ds_test = SyntheticDataset(split="test", n_images=4, img_wh=(256, 256))
    dirs = jnp.asarray(ds_test.directions)
    for vi in range(4):
        o, d = get_rays(dirs, jnp.asarray(ds_test.poses[vi]))
        out = render_test(state["params"], cfg.model, state["occ"], o, d)
        gt = jnp.asarray(ds_test.rays[vi])
        p = float(psnr(out["rgb"], gt))
        rgb = np.asarray(jnp.clip(out["rgb"], 0, 1)).reshape(256, 256, 3)
        gtn = np.asarray(gt).reshape(256, 256, 3)
        opa = np.asarray(out["opacity"]).reshape(256, 256)
        dep = np.asarray(out["depth"]).reshape(256, 256)
        imageio.imwrite(f"/tmp/view{vi}_pred.png",
                        (rgb * 255).astype(np.uint8))
        imageio.imwrite(f"/tmp/view{vi}_gt.png",
                        (gtn * 255).astype(np.uint8))
        imageio.imwrite(f"/tmp/view{vi}_opa.png",
                        (opa * 255).clip(0, 255).astype(np.uint8))
        imageio.imwrite(f"/tmp/view{vi}_dep.png",
                        (dep / max(dep.max(), 1e-6) * 255).astype(np.uint8))
        err = np.abs(rgb - gtn).mean(-1)
        imageio.imwrite(f"/tmp/view{vi}_err.png",
                        (err * 512).clip(0, 255).astype(np.uint8))
        # camera position + nearest train camera
        eye = np.asarray(ds_test.poses[vi])[:, 3]
        dists = np.linalg.norm(ds.poses[:, :, 3] - eye, axis=1)
        print(f"view {vi}: psnr={p:.2f} opa_mean={opa.mean():.3f} "
              f"eye={np.round(eye, 2)} nearest_train={dists.min():.3f}")
    save_pytree("/tmp/debug_state_params.npz",
                {"packed_table": np.asarray(state["params"]["packed_table"])})


if __name__ == "__main__":
    main()
