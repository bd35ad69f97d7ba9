"""Mixed-resolution bake sweep: slots / quality / FPS per tolerance.

Renders the bench scene through render_brick_mxu with bake_mixed outputs
at the given (tol_sigma, tol_feat) pairs.  Brick counts are PADDED to
4096-multiples with never-hit dummy bricks so every tolerance in a
bucket shares one compiled frame program (fresh tolerances would
otherwise each pay a full compile-service round trip).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/fps_mixed.py \
       [ts:tf ...]      e.g.  0:0  2:0.25  8:1.0
(0:0 = merging disabled: the pure-fine bake through the mixed path.)
Needs /tmp/bench_state_textured.npz (tools/fps_mxu2.py or bench.py).
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)


from google_nerf_tpu.models.baked_mixed import pad_bricks  # noqa: E402


def main():
    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.eval.metrics import psnr as psnr_fn
    from google_nerf_tpu.models.baked_mixed import bake_mixed
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.models.render_brick_mxu import render_brick_mxu
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
    assert os.path.exists(cache), "train first (tools/fps_mxu2.py)"
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

    kw = dict(L=192, exact_cull=96, kernel="tp", pbatch=16, bands=(),
              segment_slots=16, drain_tiles=64, drain_L=192, drain_xc=96,
              max_samples=256, T_threshold=1e-2)
    # "wl:P:cap" first token switches to the round-5 global-worklist
    # kernel (R5.4 champion shape); remaining tokens are tolerances
    specs = sys.argv[1:] or ["0:0", "2:0.25", "8:1.0"]
    if specs and specs[0].startswith("wl"):
        parts = specs[0].split(":")
        # drain kept at 512-grade capacity (drain_L/xc 256): mixed tiles
        # can exceed the 96-slot cull exactly like the pure-512 stage
        kw.update(kernel="wl", pbatch=int(parts[1]), wl_cap=int(parts[2]),
                  segment_slots=32,
                  drain_tiles=int(parts[3]) if len(parts) > 3 else 64,
                  drain_L=256, drain_xc=256)
        specs = specs[1:]

    for spec in specs:
        ts, tf = (float(v) for v in spec.split(":"))
        try:
            t0 = time.time()
            baked, bcfg, geo, stats = bake_mixed(
                params, cfg.model, occ, vres_fine=512, vres_coarse=256,
                block=8, dtype="bfloat16", tol_sigma=ts, tol_feat=tf)
            t_bake = time.time() - t0
            baked, geo = pad_bricks(baked, geo)
            out = render_brick_mxu(baked, cfg.model, o, d, 800, 800,
                                   bcfg=bcfg, geometry=geo, **kw)
            _ = float(out["rgb"].ravel()[0])
            t_compile = time.time() - t0 - t_bake
            t0 = time.time()
            for _ in range(3):
                out = render_brick_mxu(baked, cfg.model, o, d, 800, 800,
                                       bcfg=bcfg, geometry=geo, **kw)
            _ = float(out["rgb"].ravel()[0])
            dt = (time.time() - t0) / 3
            p = float(psnr_fn(out["rgb"], gt))
            print(f"tol {spec}: psnr {p:.2f}  {dt*1e3:.0f} ms = "
                  f"{1/dt:.2f} FPS | bricks {stats} | "
                  f"dma_slots={int(out['dma_slots'])} "
                  f"undrained={int(out['pairs_undrained'])} "
                  f"trunc={int(out['trunc_tiles'])} "
                  f"(bake {t_bake:.0f}s, compile {t_compile:.0f}s)")
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            print(f"tol {spec}: FAILED {type(e).__name__}: {e}"[:300])
    print("MIXED DONE")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
