"""Serving quality ladder (VERDICT r4 item 3): itemize where the MXU
serving path's dB go relative to the eval-grade oneshot renderer, with
FPS at each rung — one 800^2 frame of the bench scene per rung.

Rungs (cumulative toward the serving champion):
  oneshot_ms512      eval-grade protocol (test.py defaults: T=1e-2, ms512)
  oneshot_ms256      + serving lattice (dt doubles)
  baked512_ms256     + 512^3 bake (oneshot renderer, baked apply_fn)
  mxu512             + MXU kernel/tile-raster path (r4 champion config)
  mxu512_ms512       MXU at the eval lattice (isolates lattice vs kernel)
  mxu_v256           + 256^3 bake (the FPS champion)
  mxu_v256_T3/T4     champion at stricter T_threshold (termination price)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/quality_ladder.py \
       [rung ...]   (default: all)
Needs /tmp/bench_state_textured.npz (run tools/fps_mxu2.py or bench.py
first to train+cache the state).
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)


def main():
    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.eval.metrics import psnr as psnr_fn
    from google_nerf_tpu.models.baked import (BakedConfig, bake,
                                              make_baked_apply)
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.models.render_brick import brick_geometry
    from google_nerf_tpu.models.render_brick_mxu import render_brick_mxu
    from google_nerf_tpu.models.render_test_oneshot import \
        render_test_oneshot
    from google_nerf_tpu.ops.march_block import pack_occupancy_block2
    from google_nerf_tpu.train.system import TrainConfig, init_train_state

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=256,
                      num_epochs=30, samples_budget=131072,
                      random_bg=True, exclude_incomplete="backfill",
                      march="block")
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style="textured")
    cache = "/tmp/bench_state_textured.npz"
    assert os.path.exists(cache), "train+cache first (tools/fps_mxu2.py)"
    state = init_train_state(jax.random.PRNGKey(0), cfg, ds.K, ds.poses,
                             ds.img_wh)
    z = np.load(cache)
    flat, tree = jax.tree_util.tree_flatten(state["params"])
    params = jax.tree_util.tree_unflatten(
        tree, [jnp.asarray(z[f"p{i}"]).astype(l.dtype)
               for i, l in enumerate(flat)])
    occ = jnp.asarray(z["occ"])

    ds_t = SyntheticDataset(split="test", n_images=1, img_wh=(800, 800),
                            style="textured")
    o, d = get_rays(jnp.asarray(ds_t.directions), jnp.asarray(ds_t.poses[0]))
    gt = jnp.asarray(ds_t.rays[0])

    baked_cache = {}

    def get_baked(vres):
        if vres not in baked_cache:
            bc = BakedConfig(voxel_res=vres, block=8, dtype="bfloat16")
            bk = bake(params, cfg.model, occ, bc)
            geo = brick_geometry(bk["block_map"], bc, cfg.model)
            baked_cache[vres] = (bk, bc, geo)
        return baked_cache[vres]

    occ_cache = {}

    def get_occ_u8(ms):
        if ms not in occ_cache:
            occ_cache[ms] = pack_occupancy_block2(
                occ, max_samples=ms, scale=cfg.model.scale)
        return occ_cache[ms]

    def oneshot(ms, T, apply_fn=None, p=None):
        return render_test_oneshot(
            p if p is not None else params, cfg.model, get_occ_u8(ms),
            o, d, T_threshold=T, max_samples=ms, k=32, budget_div=0,
            straggler_div=2, drain=True, march="block2",
            compact_main=True, apply_fn=apply_fn)["rgb"]

    MXU512 = dict(L=192, exact_cull=48, kernel="tp", pbatch=8, bands=(),
                  segment_slots=8, drain_tiles=256, drain_L=256,
                  drain_xc=96, T_threshold=1e-2)
    MXUV256 = dict(L=96, exact_cull=96, kernel="tp", pbatch=16, bands=(),
                   segment_slots=16, drain_tiles=32, drain_L=128,
                   drain_xc=96, T_threshold=1e-2)

    def mxu(vres, ms, T, base):
        bk, bc, geo = get_baked(vres)
        kw = dict(base)
        kw["T_threshold"] = T
        out = render_brick_mxu(bk, cfg.model, o, d, 800, 800, bcfg=bc,
                               geometry=geo, max_samples=ms, **kw)
        return out["rgb"]

    RUNGS = {
        "oneshot_ms512": lambda: oneshot(512, 1e-2),
        "oneshot_ms256": lambda: oneshot(256, 1e-2),
        "baked512_ms256": lambda: oneshot(
            256, 1e-2, apply_fn=make_baked_apply(get_baked(512)[1]),
            p=get_baked(512)[0]),
        "baked512_ms512": lambda: oneshot(
            512, 1e-2, apply_fn=make_baked_apply(get_baked(512)[1]),
            p=get_baked(512)[0]),
        "mxu512": lambda: mxu(512, 256, 1e-2, MXU512),
        "mxu512_ms512": lambda: mxu(512, 512, 1e-2, MXU512),
        "mxu_v256": lambda: mxu(256, 256, 1e-2, MXUV256),
        "mxu_v256_ms512": lambda: mxu(256, 512, 1e-2, MXUV256),
        "mxu_v256_T3": lambda: mxu(256, 256, 1e-3, MXUV256),
        "mxu512_T3": lambda: mxu(512, 256, 1e-3, MXU512),
    }

    names = sys.argv[1:] or list(RUNGS)
    for name in names:
        fn = RUNGS[name]
        try:
            t0 = time.time()
            rgb = fn()
            _ = float(rgb.ravel()[0])
            t_first = time.time() - t0
            t0 = time.time()
            n = 3
            for _ in range(n):
                rgb = fn()
            _ = float(rgb.ravel()[0])
            dt = (time.time() - t0) / n
            p = float(psnr_fn(rgb, gt))
            print(f"{name:18s} psnr {p:6.2f}  {dt*1e3:7.0f} ms "
                  f"= {1/dt:5.2f} FPS  (first {t_first:.0f}s)")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}"[:300])
    print("LADDER DONE")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
