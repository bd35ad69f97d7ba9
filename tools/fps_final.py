"""Final FPS configuration sweep: baked field x big buckets x coarser test
lattice (max_samples).  Reports ms/frame + PSNR vs gt at 800^2."""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def main():
    from google_nerf_tpu.core.rays import get_rays
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
    cfg = TrainConfig(model=model, batch_size=8192, num_epochs=3,
                      samples_budget=131072, random_bg=True)
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style="shell")
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    for i in range(3000):
        if i % 16 == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 2*i+1),
                                     cfg=cfg, warmup=i < cfg.warmup_steps)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, 2*i),
                                          cfg=cfg)
    jax.block_until_ready(state)
    print(f"trained: psnr={float(metrics['psnr']):.1f} "
          f"occ={float(state['occ'].mean()):.3f}")

    bcfg = BakedConfig(voxel_res=512, block=8)
    t0 = time.time()
    baked = bake(state["params"], cfg.model, state["occ"], bcfg)
    print(f"bake {time.time()-t0:.0f}s {baked['n_blocks']} blocks")

    ds_t = SyntheticDataset(split="test", n_images=1, img_wh=(800, 800),
                            style="shell")
    o, d = get_rays(jnp.asarray(ds_t.directions),
                    jnp.asarray(ds_t.poses[0]))
    gt = jnp.asarray(ds_t.rays[0])

    variants = [
        ("live ms1024", None, dict(max_samples=1024, chunk=655360,
                                   bucket=131072, k=64, n_segs=64,
                                   n_keep=16)),
        ("baked ms1024", bcfg, dict(max_samples=1024, chunk=655360,
                                    bucket=131072, k=64, n_segs=64,
                                    n_keep=16)),
        ("baked ms512", bcfg, dict(max_samples=512, chunk=655360,
                                   bucket=131072, k=64, n_segs=32,
                                   n_keep=16)),
        ("baked ms256", bcfg, dict(max_samples=256, chunk=655360,
                                   bucket=131072, k=32, n_segs=16,
                                   n_keep=16)),
        ("baked ms512 wide", bcfg, dict(max_samples=512, chunk=655360,
                                        bucket=262144, k=64, n_segs=64,
                                        n_keep=16)),
    ]
    from google_nerf_tpu.ops.grid import pack_occupancy_u8
    from google_nerf_tpu.ops.march_seg import required_dilation_radius

    occ_cache = {}
    for name, bc, v in variants:
        # a coarser test lattice (bigger dt) needs a BIGGER dilation
        # radius for the segment byte to stay conservative
        ms = v["max_samples"]
        if ms not in occ_cache:
            occ_cache[ms] = pack_occupancy_u8(
                state["occ"],
                required_dilation_radius(8, cfg.model.grid_size, ms,
                                         cfg.model.scale))
        occ_u8 = occ_cache[ms]
        if bc is None:
            def frame():
                return render_test_fast(state["params"], cfg.model,
                                        occ_u8, o, d,
                                        T_threshold=1e-2, **v)["rgb"]
        else:
            def frame():
                return render_test_baked(baked, cfg.model, occ_u8,
                                         o, d, bcfg=bc, T_threshold=1e-2,
                                         **v)["rgb"]
        out = frame()
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [frame() for _ in range(3)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / 3
        print(f"{name} {v}: {dt*1e3:.0f} ms = {1/dt:.2f} FPS | "
              f"psnr {float(psnr_fn(out, gt)):.2f}")


if __name__ == "__main__":
    main()
