"""A/B benchmark: segment marcher vs one-phase block-row marcher.

Measures (on whatever backend is active):
  * steady-state fused-train-step throughput at the flagship bench recipe
    (bench.py config: batch 8192, k=256, budget 131072, random bg,
    backfill) for march=seg and march=block;
  * one-shot 800^2 render FPS for both marchers at the serving lattice.

Run on the real chip:  python tools/block_bench.py --steps 512
"""
import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def train_ab(march: str, n_timed: int, fps_variants: str, warmup: int = 512):
    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.eval.metrics import psnr as psnr_fn
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.models.render_test_oneshot import render_test_oneshot
    from google_nerf_tpu.ops.grid import (pack_occupancy_blocks,
                                          pack_occupancy_u8)
    from google_nerf_tpu.ops.march_seg import required_dilation_radius
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=256,
                      num_epochs=30, samples_budget=131072,
                      random_bg=True, exclude_incomplete="backfill",
                      march=march)
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256))
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)

    def loop(state, n, start):
        metrics = None
        for i in range(start, start + n):
            if i % cfg.grid_update_interval == 0:
                state = grid_update_step(
                    state, jax.random.fold_in(key, 2 * i + 1), cfg=cfg,
                    warmup=i < cfg.warmup_steps)
            state, metrics = fused_train_step(
                state, scene, jax.random.fold_in(key, 2 * i), cfg=cfg)
        jax.block_until_ready(state)
        return state, metrics

    t0 = time.time()
    state, _ = loop(state, warmup, 0)
    print(f"[{march}] warmup {warmup} steps (incl compile): "
          f"{time.time()-t0:.0f}s")
    t0 = time.time()
    state, metrics = loop(state, n_timed, warmup)
    dt = time.time() - t0
    rps = n_timed * cfg.batch_size / dt
    print(json.dumps({
        "march": march,
        "train_rays_per_sec": round(rps, 1),
        "step_ms": round(1e3 * dt / n_timed, 1),
        "psnr_at_1024": round(float(metrics["psnr"]), 2),
        "s_per_ray": round(float(metrics["s_per_ray"]), 2),
        "occ_frac": round(float(state["occ"].mean()), 4),
    }))

    if not fps_variants:
        return
    ds_t = SyntheticDataset(split="test", n_images=1, img_wh=(800, 800))
    o, d = get_rays(jnp.asarray(ds_t.directions), jnp.asarray(ds_t.poses[0]))
    gt = jnp.asarray(ds_t.rays[0])
    for spec in fps_variants.split(","):
        f = dict(k=32, p=6, bd=0, sd=8, ms=512)
        for part in spec.split(":"):
            kname = part.rstrip("0123456789")
            f[kname] = int(part[len(kname):])
        ms = f["ms"]
        if march == "block":
            occ_r = pack_occupancy_blocks(state["occ"])
        else:
            occ_r = pack_occupancy_u8(
                state["occ"],
                required_dilation_radius(8, 128, ms, 0.5),
                super_radius=required_dilation_radius(32, 128, ms, 0.5))

        def frame():
            return render_test_oneshot(
                state["params"], cfg.model, occ_r, o, d, T_threshold=1e-2,
                max_samples=ms, chunk=131072, k=f["k"], passes=f["p"],
                budget_div=f["bd"], straggler_div=f["sd"],
                march=march)["rgb"]
        out = frame()
        jax.block_until_ready(out)
        t0 = time.time()
        outs = [frame() for _ in range(3)]
        jax.block_until_ready(outs)
        dt = (time.time() - t0) / 3
        print(f"[{march}] fps {spec}: {dt*1e3:.0f} ms = {1/dt:.2f} FPS | "
              f"psnr {float(psnr_fn(out, gt)):.2f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--warmup", type=int, default=512)
    ap.add_argument("--marchers", default="block,seg")
    ap.add_argument("--fps_variants", default="k32:p6:bd0:sd8:ms512")
    ap.add_argument("--platform", default=None)
    av = ap.parse_args()
    if av.platform:
        jax.config.update("jax_platforms", av.platform)
    for march in av.marchers.split(","):
        train_ab(march, av.steps, av.fps_variants, warmup=av.warmup)
    print("=== BLOCK_BENCH DONE")


if __name__ == "__main__":
    main()
