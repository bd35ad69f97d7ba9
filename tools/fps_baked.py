"""Baked-renderer FPS + fidelity harness: train briefly on the 256^2
procedural scene, bake, then sweep renderer parameters at 800^2 and
report ms/frame + PSNR vs both gt and the live renderer."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)


def main():
    from google_nerf_tpu.core.rays import get_ray_directions, get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.eval.metrics import psnr as psnr_fn
    from google_nerf_tpu.models.baked import (BakedConfig, bake,
                                              render_test_baked)
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.models.render_test_fast import render_test_fast
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=8192, num_epochs=4,
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
    print(f"trained: psnr={float(metrics['psnr']):.1f} occ={occ_frac:.3f}")

    t0 = time.time()
    bcfg = BakedConfig(voxel_res=512, block=8)
    baked = bake(state["params"], cfg.model, state["occ"], bcfg)
    print(f"bake: {time.time()-t0:.1f}s, {baked['n_blocks']} blocks, "
          f"pool {baked['pool'].nbytes/2**20:.0f} MiB")

    ds_t = SyntheticDataset(split="test", n_images=1, img_wh=(800, 800),
                            style="shell")
    o, d = get_rays(jnp.asarray(ds_t.directions),
                    jnp.asarray(ds_t.poses[0]))
    gt = jnp.asarray(ds_t.rays[0])

    live = render_test_fast(state["params"], cfg.model, state["occ_u8"],
                            o, d, T_threshold=1e-2)
    jax.block_until_ready(live["rgb"])
    print(f"live render psnr vs gt: {float(psnr_fn(live['rgb'], gt)):.2f}")

    variants = [
        dict(k=32, n_segs=32, n_keep=8, bucket=32768),
        dict(k=64, n_segs=32, n_keep=16, bucket=32768),
        dict(k=64, n_segs=64, n_keep=16, bucket=65536),
        dict(k=128, n_segs=64, n_keep=32, bucket=65536),
        dict(k=64, n_segs=64, n_keep=16, bucket=131072),
    ]
    for v in variants:
        def frame():
            return render_test_baked(baked, cfg.model, state["occ_u8"],
                                     o, d, bcfg=bcfg, T_threshold=1e-2,
                                     **v)["rgb"]
        out = frame()
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [frame() for _ in range(3)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / 3
        p_gt = float(psnr_fn(out, gt))
        p_live = float(psnr_fn(out, live["rgb"]))
        print(f"{v}: {dt*1e3:.0f} ms = {1/dt:.2f} FPS | "
              f"psnr vs gt {p_gt:.2f} vs live {p_live:.2f}")


if __name__ == "__main__":
    main()
