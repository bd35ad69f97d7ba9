"""Stage-by-stage 800^2 serving profile (honest scalar-fetch timing).

Stages timed independently on the SAME trained state (3k-step shell
scene), each chained through a data dependency and closed with a host
scalar fetch (DESIGN_NOTES timing-audit law):

  super   phase-A scan only (8 tiny gathers/ray, all rays)
  march2  full block2 march on a content-sized chunk
  field_l live packed-encoder field on a fixed sample batch
  field_b baked-pool field on the same batch
  frame   full compact-main oneshot (live and, with --bake, baked)

Usage: python tools/profile_serving.py [--bake] [--frames N]
"""
import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def timed(fn, *args, n=3, label=""):
    out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    t0 = time.time()
    for _i in range(n):
        out = fn(*args)
    _ = float(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0])
    dt = (time.time() - t0) / n
    print(f"{label:28s} {dt * 1e3:8.1f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bake", action="store_true")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--ms", type=int, default=512)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--style", default="shell")
    av = ap.parse_args(sys.argv[1:])

    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.ngp import NGPConfig, ngp_apply
    from google_nerf_tpu.models.render_test_oneshot import render_test_oneshot
    from google_nerf_tpu.ops.march_block import (march_rays_train_block2,
                                                 pack_occupancy_block2,
                                                 super_any_live)
    from google_nerf_tpu.ops.ray_aabb import clamp_near, ray_aabb_intersect
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    # cfg matches bench.py EXACTLY (k_samples/backfill/march included):
    # the fused train program then hits the remote compile cache — a
    # config-off-by-one costs a fresh compile (tens of minutes when the
    # tunnel is degraded)
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=256,
                      num_epochs=30, samples_budget=131072,
                      random_bg=True, exclude_incomplete="backfill",
                      march="block")
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style=av.style)
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    import time as _t
    t_train0 = _t.time()
    for i in range(av.steps):
        if i % 16 == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 2*i+1),
                                     cfg=cfg, warmup=i < cfg.warmup_steps)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, 2*i),
                                          cfg=cfg)
        if i % 500 == 0:
            _ = float(metrics["psnr"])
            print(f"  step {i}: psnr={float(metrics['psnr']):.1f} "
                  f"({_t.time()-t_train0:.0f}s)")
    _ = float(state["params"]["packed_table"].ravel()[0])
    print(f"trained: psnr={float(metrics['psnr']):.1f} "
          f"occ={float(state['occ'].mean()):.3f}")

    ds_t = SyntheticDataset(split="test", n_images=1, img_wh=(800, 800),
                            style=av.style)
    o, d = get_rays(jnp.asarray(ds_t.directions), jnp.asarray(ds_t.poses[0]))
    gt = jnp.asarray(ds_t.rays[0])
    ms = av.ms
    occ2 = pack_occupancy_block2(state["occ"], max_samples=ms, scale=0.5)

    # --- stage: super scan (all 640k rays) ---
    hits = clamp_near(ray_aabb_intersect(o, d, jnp.zeros(3),
                                         jnp.full((3,), 0.5)), 0.05)

    @jax.jit
    def stage_super(o, d, hits):
        return super_any_live(o, d, hits, occ2, scale=0.5, grid_size=128,
                              max_samples=ms)
    alive = stage_super(o, d, hits)
    n_alive = int(alive.sum())
    print(f"alive rays after super scan: {n_alive} / {o.shape[0]} "
          f"({100.0 * n_alive / o.shape[0]:.1f}%)")
    timed(stage_super, o, d, hits, label="super scan 640k rays")

    # --- stage: drain-trip ray selection (top_k over the full image) ---
    iota = jnp.arange(o.shape[0], dtype=jnp.int32)

    @jax.jit
    def stage_topk(alive):
        score = jnp.where(alive, -iota, jnp.int32(-(o.shape[0] + 1)))
        return jax.lax.top_k(score, 131072 // 8)[1]
    timed(stage_topk, alive, label="drain top_k 640k->16k")

    # --- stage: block2 march on a 131k chunk ---
    C = 131072

    @jax.jit
    def stage_march(o, d, hits):
        return march_rays_train_block2(
            o[:C], d[:C], hits[:C], occ2, scale=0.5, grid_size=128,
            max_samples=ms, k_samples=32, noise=jnp.zeros(C),
            n_keep_super=2, n_keep_groups=8)["valid"]
    timed(stage_march, o, d, hits, label=f"block2 march {C} rays")

    # --- stage: field eval on 4.2M samples (131k x 32) ---
    N = C * 32
    xs = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), minval=-0.4,
                            maxval=0.4)
    dirs = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (N, 3))

    @jax.jit
    def stage_field_live(xs, dirs):
        return ngp_apply(state["params"], cfg.model, xs, dirs)[0]
    timed(stage_field_live, xs, dirs, label=f"live field {N} samples")

    baked_fn = baked = None
    if av.bake:
        from google_nerf_tpu.models.baked import (BakedConfig, bake,
                                                  make_baked_apply)
        bcfg = BakedConfig(voxel_res=512, block=8, dtype="float8_e4m3fn")
        t0 = time.time()
        baked = bake(state["params"], cfg.model, state["occ"], bcfg)
        _ = float(baked["pool"].ravel()[0].astype(jnp.float32))
        print(f"bake {time.time() - t0:.0f}s {baked['n_blocks']} blocks")
        baked_fn = make_baked_apply(bcfg)

        # baked must be an ARGUMENT, not a closure: a closed-over ~100 MB
        # fp8 pool becomes an HLO constant and the remote-compile request
        # blows the tunnel's body limit (HTTP 413)
        @jax.jit
        def stage_field_baked(baked, xs, dirs):
            return baked_fn(baked, cfg.model, xs, dirs)[0]
        timed(stage_field_baked, baked, xs, dirs,
              label=f"baked field {N} samples")

    # --- full frames ---
    for name, p, fn in [("live", state["params"], None)] + (
            [("baked", baked, baked_fn)] if baked_fn else []):
        for sd in (2, 4, 8):
            def frame():
                return render_test_oneshot(
                    p, cfg.model, occ2, o, d, T_threshold=1e-2,
                    max_samples=ms, k=32, budget_div=0, straggler_div=sd,
                    drain=True, march="block2", compact_main=True,
                    apply_fn=fn)
            full = frame()
            trips = int(full["drain_trips"])
            dt = timed(lambda: frame()["rgb"], n=av.frames,
                       label=f"frame compact {name} sd={sd}")
            from google_nerf_tpu.eval.metrics import psnr as psnr_fn
            print(f"  -> {1.0 / dt:.2f} FPS  trips={trips} "
                  f"psnr={float(psnr_fn(full['rgb'], gt)):.2f}")


if __name__ == "__main__":
    main()
