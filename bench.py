"""Benchmark: steady-state training throughput (rays/sec/chip) on the
procedural synthetic scene, with the flagship hash-grid NGP config.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec_per_chip", "value": N, "unit": "rays/s",
   "vs_baseline": N}
vs_baseline is relative to the reference's published recipe: 30k steps x
8192 rays in ~5 min on an RTX 2080 Ti (`ngp_pl/README.md:111`) ~= 819200
rays/s (BASELINE.md).
"""
from __future__ import annotations

import json
import time

BASELINE_RAYS_PER_SEC = 30000 * 8192 / 300.0  # 2080 Ti, BASELINE.md


def main():
    import jax

    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)
    import jax.numpy as jnp

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    # march="block": one-phase 8^3 block-row marcher — measured faster than
    # the segment marcher (70.4 vs 75.3 ms/step) at equal-or-better
    # convergence (49.45 vs 48.57 PSNR@1024) in the A/B (tools/block_bench.py)
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=256,
                      num_epochs=30, samples_budget=131072,
                      random_bg=True, exclude_incomplete="backfill",
                      march="block")

    # style="textured": shell geometry + high-frequency surface detail —
    # the realized samples/ray and encoder stress match real benchmark
    # scenes (data/synthetic.py:44-51); the earlier "solid" default
    # flattered rays/s with opaque interiors the grid prunes early
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style="textured")
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)

    def loop(state, n, t_start_step):
        for i in range(t_start_step, t_start_step + n):
            if i % cfg.grid_update_interval == 0:
                state = grid_update_step(
                    state, jax.random.fold_in(key, 2 * i + 1), cfg=cfg,
                    warmup=i < cfg.warmup_steps)
            state, metrics = fused_train_step(
                state, scene, jax.random.fold_in(key, 2 * i), cfg=cfg)
        # true host fetch: block_until_ready can return early through the
        # axon relay (tools/microbench_encoder_bwd3.py methodology), which
        # would over-report throughput; fetching a scalar cannot
        _ = float(jax.tree_util.tree_leaves(state)[0].ravel()[0])
        return state, metrics

    # warmup: compile + converge the occupancy grid to realistic sparsity
    state, _ = loop(state, 512, 0)

    # timed steady-state segment (grid cadence included, as in real training)
    n_timed = 512
    t0 = time.time()
    state, metrics = loop(state, n_timed, 512)
    dt = time.time() - t0

    rays_per_sec = n_timed * cfg.batch_size / dt
    # ---- 800x800 novel-view render FPS (reference: ngp_pl/test.py:33,
    # published 32.44 avg FPS on a 2080 Ti, BASELINE.md) ----
    from google_nerf_tpu.core.rays import get_ray_directions, get_rays
    from google_nerf_tpu.models.render_test_oneshot import \
        render_test_oneshot

    w = h = 800
    K800 = jnp.asarray([[w * 1.1, 0, w / 2], [0, w * 1.1, h / 2], [0, 0, 1]])
    dirs800 = get_ray_directions(h, w, K800)
    pose = jnp.broadcast_to(jnp.asarray(ds.poses[0]), (h * w, 3, 4))
    rays_o, rays_d = get_rays(dirs800, pose)

    from google_nerf_tpu.ops.march_block import pack_occupancy_block2

    # serving lattice: 512 measured ~lossless vs 1024 and strictly faster
    # (see opt.py --render_max_samples); block2 tables for that dt
    ms_render = 512
    occ_render = pack_occupancy_block2(state["occ"], max_samples=ms_render,
                                       scale=cfg.model.scale)

    def render_frame(apply_fn=None, p=None):
        # compact-main one-shot: phase-A super scan culls background rays,
        # drain trips render only content (exact — every alive ray drains)
        return render_test_oneshot(p if p is not None else state["params"],
                                   cfg.model, occ_render,
                                   rays_o, rays_d, T_threshold=1e-2,
                                   max_samples=ms_render, k=32,
                                   budget_div=0, straggler_div=2,
                                   drain=True, march="block2",
                                   compact_main=True,
                                   apply_fn=apply_fn)["rgb"]

    out = render_frame()
    _ = float(out[0, 0])
    t0 = time.time()
    n_frames = 5
    outs = [render_frame() for _ in range(n_frames)]
    # scalar fetch bounds all in-order dispatches (timing-audit law:
    # block_until_ready can return early through the axon relay)
    _ = float(outs[-1][0, 0])
    fps = n_frames / (time.time() - t0)

    # ---- brick serving renderer at the same 800^2 view (bake once,
    # rasterize cone-culled brick lists; models/render_brick.py).
    # Guarded: the headline train metric prints even if this path fails.
    brick_stats = {}
    try:
        from google_nerf_tpu.models.baked import BakedConfig, bake
        from google_nerf_tpu.models.render_brick import (brick_geometry,
                                                         render_brick)
        bcfg = BakedConfig(voxel_res=512, block=8, dtype="float8_e4m3fn")
        t0 = time.time()
        baked = bake(state["params"], cfg.model, state["occ"], bcfg)
        t_bake = time.time() - t0
        geo = brick_geometry(baked["block_map"], bcfg, cfg.model)

        # auto pairs budget (as test.py --brick_ppr 0): probe the frame's
        # true window counts with a generous budget, then size the shared
        # per-chunk budget off the DENSEST chunk (content concentrates in
        # central chunks; 1.5x the frame MEAN starved them — BENCH_r01
        # measured 560,930 dropped pairs at auto ppr 9.3)
        probe = render_brick(baked, cfg.model, rays_o, rays_d, w, h,
                             bcfg=bcfg, T_threshold=1e-2, geometry=geo,
                             L=256, Lk=24, pairs_per_ray=16.0,
                             chunk_tiles=1024, max_samples=ms_render)
        chunk_rays = 1024 * 64  # chunk_tiles * tile^2
        ppr = max(0.5, round(1.25 * float(
            jnp.max(probe["pairs_per_chunk"])) / chunk_rays, 1))

        def brick_frame():
            return render_brick(baked, cfg.model, rays_o, rays_d, w, h,
                                bcfg=bcfg, T_threshold=1e-2, geometry=geo,
                                L=256, Lk=24, pairs_per_ray=ppr,
                                chunk_tiles=1024, max_samples=ms_render)

        bo = brick_frame()
        _ = float(bo["rgb"][0, 0])
        t0 = time.time()
        bos = [brick_frame()["rgb"] for _ in range(n_frames)]
        _ = float(bos[-1][0, 0])
        brick_fps = n_frames / (time.time() - t0)
        agree = float(jnp.abs(bo["rgb"] - out).mean())

        # baked + compact oneshot: the deploy-path headline (1 pool row
        # per sample instead of 8 live encoder rows)
        from google_nerf_tpu.models.baked import make_baked_apply
        baked_fn = make_baked_apply(bcfg)
        ob = render_frame(apply_fn=baked_fn, p=baked)
        _ = float(ob[0, 0])
        t0 = time.time()
        obs = [render_frame(apply_fn=baked_fn, p=baked)
               for _ in range(n_frames)]
        _ = float(obs[-1][0, 0])
        baked_fps = n_frames / (time.time() - t0)
        brick_stats = {
            "render_fps_800_baked_oneshot": round(baked_fps, 2),
            "baked_vs_live_mae": round(float(jnp.abs(ob - out).mean()), 4),
            "render_fps_800_brick": round(brick_fps, 2),
            "brick_vs_oneshot_mae": round(agree, 4),
            "brick_pairs_dropped": int(bo["pairs_dropped"]),
            "brick_ppr_auto": ppr,
            "bake_seconds": round(t_bake, 1),
        }

        # MXU tile-raster renderer (ops/pallas/brick_field.py): slab-DMA +
        # one-hot trilerp matmuls, no pairs budget — the gather-free path
        try:
            from google_nerf_tpu.models.render_brick_mxu import \
                render_brick_mxu

            def mxu_frame():
                return render_brick_mxu(baked, cfg.model, rays_o, rays_d,
                                        w, h, bcfg=bcfg, L=64, kernel="t",
                                        bands="auto",
                                        max_samples=ms_render,
                                        T_threshold=1e-2, geometry=geo)
            mo = mxu_frame()
            _ = float(mo["rgb"][0, 0])
            t0 = time.time()
            mos = [mxu_frame()["rgb"] for _ in range(n_frames)]
            _ = float(mos[-1][0, 0])
            brick_stats["render_fps_800_mxu"] = round(
                n_frames / (time.time() - t0), 2)
            brick_stats["mxu_vs_oneshot_mae"] = round(
                float(jnp.abs(mo["rgb"] - out).mean()), 4)
            brick_stats["mxu_trunc_tiles"] = int(mo["trunc_tiles"])
        except Exception as e:  # pragma: no cover - chip-env dependent
            brick_stats["mxu_error"] = f"{type(e).__name__}: {e}"[:120]
    except Exception as e:  # pragma: no cover - chip-env dependent
        brick_stats = {"brick_error": f"{type(e).__name__}: {e}"[:120]}

    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "extra": {
            "steady_state_steps_per_sec": round(n_timed / dt, 2),
            "train_psnr_at_1024_steps": round(float(metrics["psnr"]), 2),
            "s_per_ray": round(float(metrics["s_per_ray"]), 2),
            "mask_frac": round(float(metrics.get("mask_frac", 1.0)), 3),
            "render_fps_800": round(fps, 2),
            "render_fps_800_vs_baseline": round(fps / 32.44, 3),
            "device": str(jax.devices()[0]),
            **brick_stats,
        },
    }))


if __name__ == "__main__":
    main()
