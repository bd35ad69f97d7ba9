"""Brick-renderer FPS + fidelity harness on the real chip.

Shares the fps-harness train+bake recipe (identical jitted programs so
the persistent compile cache hits), then sweeps the tile-rasterized brick
renderer (models/render_brick.py) at 800^2 against gt and reports
ms/frame, PSNR, and truncation telemetry.  Prints DONE at the end so a
chained driver can poll the log.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)


def main():
    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.eval.metrics import psnr as psnr_fn
    from google_nerf_tpu.models.baked import BakedConfig, bake
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.models.render_brick import (brick_geometry,
                                                     render_brick)
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
    t0 = time.time()
    for i in range(3584):
        if i % 16 == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 2*i+1),
                                     cfg=cfg, warmup=i < cfg.warmup_steps)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, 2*i),
                                          cfg=cfg)
    jax.block_until_ready(state)
    occ_frac = float(jnp.mean(state["occ"].astype(jnp.float32)))
    print(f"trained in {time.time()-t0:.0f}s: "
          f"psnr={float(metrics['psnr']):.1f} occ={occ_frac:.3f}")

    bakes = {}
    for dtype in ("bfloat16", "float8_e4m3fn"):
        t0 = time.time()
        bcfg = BakedConfig(voxel_res=512, block=8, dtype=dtype)
        baked = bake(state["params"], cfg.model, state["occ"], bcfg)
        print(f"bake[{dtype}]: {time.time()-t0:.1f}s, "
              f"{baked['n_blocks']} blocks, "
              f"pool {baked['pool'].nbytes/2**20:.0f} MiB")
        bakes[dtype] = (bcfg, baked)
    bcfg, baked = bakes["bfloat16"]
    geo = brick_geometry(baked["block_map"], bcfg, cfg.model)
    print(f"bricks: {geo[0].shape[0]}")

    ds_t = SyntheticDataset(split="test", n_images=1, img_wh=(800, 800),
                            style="shell")
    o, d = get_rays(jnp.asarray(ds_t.directions),
                    jnp.asarray(ds_t.poses[0]))
    gt = jnp.asarray(ds_t.rays[0])

    FR = (0.5, 0.35, 0.25, 0.18, 0.12, 0.08)   # early-term pass budgets

    # auto pairs budget per max_samples: probe the frame's true window
    # counts with a generous budget and size the shared per-chunk budget
    # off the DENSEST chunk (content concentrates in central chunks;
    # a frame-mean budget starved them — BENCH_r01 measured 560,930
    # dropped pairs at auto ppr 9.3)
    ppr_cache = {}

    def auto_ppr(ms):
        if ms not in ppr_cache:
            probe = render_brick(baked, cfg.model, o, d, 800, 800,
                                 bcfg=bcfg, T_threshold=1e-2, geometry=geo,
                                 tile=8, chunk_tiles=1024, L=256, Lk=24,
                                 pairs_per_ray=16.0, max_samples=ms)
            chunk_rays = 1024 * 64
            ppr_cache[ms] = max(0.5, round(1.25 * float(
                jnp.max(probe["pairs_per_chunk"])) / chunk_rays, 1))
            print(f"auto ppr[ms={ms}]: {int(probe['pairs_total'])} windows "
                  f"(densest chunk "
                  f"{int(jnp.max(probe['pairs_per_chunk']))}) "
                  f"-> ppr {ppr_cache[ms]}")
        return ppr_cache[ms]

    # L=256 is the quality default (tiered selection rescues L=96 at
    # 256^2 but still truncates content); at 800^2 the tile cones are
    # ~10x narrower, so the fp8 L=96 variant measures whether the
    # cheaper lists hold at serving resolution.
    variants = [
        ("bfloat16", dict(tile=8, chunk_tiles=1024, L=256, Lk=24,
                          pairs_per_ray=auto_ppr(512), max_samples=512)),
        ("float8_e4m3fn", dict(tile=8, chunk_tiles=1024, L=256, Lk=24,
                               pairs_per_ray=auto_ppr(512),
                               max_samples=512)),
        ("float8_e4m3fn", dict(tile=8, chunk_tiles=1024, L=96, Lk=24,
                               pairs_per_ray=auto_ppr(512),
                               max_samples=512)),
        ("float8_e4m3fn", dict(tile=8, chunk_tiles=1024, L=256, Lk=24,
                               pairs_per_ray=auto_ppr(256),
                               max_samples=256)),
        ("float8_e4m3fn", dict(tile=8, chunk_tiles=1024, L=256, Lk=24,
                               pass_fracs=FR, max_samples=512)),
        ("float8_e4m3fn", dict(tile=8, chunk_tiles=1024, L=256, Lk=24,
                               pass_fracs=FR, max_samples=256)),
    ]
    for dtype, v in variants:
        bcfg_v, baked_v = bakes[dtype]

        def frame():
            return render_brick(baked_v, cfg.model, o, d, 800, 800,
                                bcfg=bcfg_v, T_threshold=1e-2, geometry=geo,
                                **v)
        t0 = time.time()
        out = frame()
        # true host fetch: block_until_ready can return early through the
        # axon relay (tools/microbench_encoder_bwd3.py methodology)
        _ = float(out["rgb"].ravel()[0])
        t_compile = time.time() - t0
        t0 = time.time()
        outs = [frame()["rgb"] for _ in range(3)]
        _ = float(outs[-1].ravel()[0])
        dt = (time.time() - t0) / 3
        p_gt = float(psnr_fn(out["rgb"], gt))
        print(f"{dtype} {v}: {dt*1e3:.0f} ms = {1/dt:.2f} FPS "
              f"(first {t_compile:.0f}s) | psnr vs gt {p_gt:.2f} | "
              f"trunc_tiles={int(out['trunc_tiles'])} "
              f"trunc_rays={int(out['trunc_rays'])} "
              f"pairs_dropped={int(out['pairs_dropped'])}")
    print("DONE")


if __name__ == "__main__":
    main()
