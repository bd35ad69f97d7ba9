"""MXU brick-renderer FPS + fidelity harness on the real chip.

Same train+bake recipe as tools/fps_brick.py (identical jitted programs so
the persistent compile cache hits), then sweeps the MXU tile-raster
renderer (models/render_brick_mxu.py, ops/pallas/brick_field.py) at 800^2
against gt and reports ms/frame, PSNR, and truncation telemetry.  Prints
DONE at the end so a chained driver can poll the log.
"""
import functools
import os
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
    from google_nerf_tpu.models.render_brick import brick_geometry
    from google_nerf_tpu.models.render_brick_mxu import render_brick_mxu
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=8192, num_epochs=4,
                      samples_budget=131072, random_bg=True)
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style="shell")
    # cache the trained params+occ across harness runs: kernel iteration
    # shouldn't pay the ~240 s train leg every time
    cache = "/tmp/fps_state_shell.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        key = jax.random.PRNGKey(0)
        state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
        flat, tree = jax.tree_util.tree_flatten(state["params"])
        state["params"] = jax.tree_util.tree_unflatten(
            tree, [jnp.asarray(z[f"p{i}"]).astype(l.dtype)
                   for i, l in enumerate(flat)])
        state["occ"] = jnp.asarray(z["occ"])
        print(f"loaded cached state: occ="
              f"{float(jnp.mean(state['occ'].astype(jnp.float32))):.3f}")
    else:
        scene = ds.scene()
        key = jax.random.PRNGKey(0)
        state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
        t0 = time.time()
        for i in range(3584):
            if i % 16 == 0:
                state = grid_update_step(state,
                                         jax.random.fold_in(key, 2*i+1),
                                         cfg=cfg, warmup=i < cfg.warmup_steps)
            state, metrics = fused_train_step(state, scene,
                                              jax.random.fold_in(key, 2*i),
                                              cfg=cfg)
        jax.block_until_ready(state)
        occ_frac = float(jnp.mean(state["occ"].astype(jnp.float32)))
        print(f"trained in {time.time()-t0:.0f}s: "
              f"psnr={float(metrics['psnr']):.1f} occ={occ_frac:.3f}")
        flat, _ = jax.tree_util.tree_flatten(state["params"])
        np.savez(cache, occ=np.asarray(state["occ"]),
                 **{f"p{i}": np.asarray(l, dtype=np.float32)
                    for i, l in enumerate(flat)})

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

    variants = [
        # ordered by information value (a watchdog cut keeps the head):
        # r3 question 0: P-slot batching (P slabs per grid step) vs the
        # per-slot t-kernel.  r3 question 1: does the EXACT drain (no
        # trunc/band drops) hold speed?  r3 question 2: t-vs-n at same
        # config; then the speed/quality frontier (ms, L, bands)
        ("float8_e4m3fn", dict(L=64, max_samples=512, chunk_tiles=512,
                               kernel="tp", pbatch=4, bands="auto",
                               drain_tiles=256)),
        ("float8_e4m3fn", dict(L=64, max_samples=512, chunk_tiles=512,
                               kernel="tp", pbatch=8, bands="auto",
                               drain_tiles=256)),
        ("float8_e4m3fn", dict(L=64, max_samples=512, chunk_tiles=512,
                               kernel="t", bands="auto", drain_tiles=256)),
        ("float8_e4m3fn", dict(L=64, max_samples=512, chunk_tiles=512,
                               kernel="t", bands="auto", drain_tiles=0)),
        ("float8_e4m3fn", dict(L=64, max_samples=256, chunk_tiles=512,
                               kernel="t", bands="auto", drain_tiles=256)),
        ("float8_e4m3fn", dict(L=64, max_samples=512, chunk_tiles=512,
                               kernel="n", bands="auto", drain_tiles=256)),
        ("float8_e4m3fn", dict(L=32, max_samples=512, chunk_tiles=512,
                               kernel="t", bands="auto", drain_tiles=256)),
        ("float8_e4m3fn", dict(L=64, max_samples=512, chunk_tiles=512,
                               kernel="t", drain_tiles=256)),
        ("float8_e4m3fn", dict(L=96, max_samples=512, chunk_tiles=512,
                               kernel="t", bands="auto", drain_tiles=256)),
    ]
    for dtype, v in variants:
        bcfg_v, baked_v = bakes[dtype]

        def frame():
            return render_brick_mxu(baked_v, cfg.model, o, d, 800, 800,
                                    bcfg=bcfg_v, T_threshold=1e-2,
                                    geometry=geo, **v)
        try:
            t0 = time.time()
            out = frame()
            # true host fetch: block_until_ready can return early through
            # the axon relay (tools/microbench_encoder_bwd3.py methodology)
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
                  f"pairs={int(out['pairs_rendered'])} "
                  f"undrained={int(out.get('pairs_undrained', 0))}")
        except Exception as e:  # noqa: BLE001 — sweep survives one variant
            print(f"{dtype} {v}: FAILED {type(e).__name__}: {e}")
    print("DONE")


if __name__ == "__main__":
    main()
