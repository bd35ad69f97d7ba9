"""Component breakdown of the FLAGSHIP train step (block march, stream
composite, ray-major budget pack) on the real chip — chained timing with a
host scalar fetch (DESIGN_NOTES round-8 law).

Stages: e2e fused step | grid update | block march | block2 march |
plan_packing (row-major, sort-free) | encoder f+b | field f+b |
stream composite f+b.  One JSON line per stage so a watchdog cut keeps
everything measured so far.
"""
import functools
import json
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def chain_time(step_fn, carry0, n=10):
    c = step_fn(carry0)
    _ = float(jax.tree.leaves(c)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        c = step_fn(c)
    _ = float(jax.tree.leaves(c)[0].ravel()[0])
    return (time.perf_counter() - t0) / n, c


def emit(name, dt_s, **kv):
    print(json.dumps(dict(stage=name, ms=round(dt_s * 1e3, 2), **kv)))


def main():
    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.ngp import NGPConfig, ngp_apply
    from google_nerf_tpu.models.rendering import render_train
    from google_nerf_tpu.ops.compaction import pack, plan_packing
    from google_nerf_tpu.ops.march_block import (march_rays_train_block,
                                                 march_rays_train_block2,
                                                 pack_occupancy_block2)
    from google_nerf_tpu.ops.packed_hash import packed_hash_encode
    from google_nerf_tpu.ops.ray_aabb import clamp_near, ray_aabb_intersect
    from google_nerf_tpu.ops.stream_composite import composite_stream_train
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state, sample_batch)

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=256,
                      num_epochs=30, samples_budget=131072, random_bg=True,
                      exclude_incomplete="backfill", march="block")
    R, K, B = cfg.batch_size, cfg.k_samples, cfg.samples_budget
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style="textured")
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    t0 = time.time()
    for i in range(512):
        if i % 16 == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 991 + i),
                                     cfg=cfg, warmup=i < 256)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, i),
                                          cfg=cfg)
    print(f"warmed in {time.time()-t0:.0f}s "
          f"s_per_ray={float(metrics['s_per_ray']):.1f} "
          f"occ={float(state['occ'].mean()):.3f}")

    def e2e(c):
        st, i = c
        st, _ = fused_train_step(st, scene, jax.random.fold_in(key, i),
                                 cfg=cfg)
        return (st, i + 1)

    dt, (state, _) = chain_time(e2e, (state, jnp.int32(600)), n=20)
    emit("e2e_step", dt, rays_per_sec=round(R / dt))

    def gupd(c):
        st, i = c
        st = grid_update_step(st, jax.random.fold_in(key, i), cfg=cfg,
                              warmup=False)
        return (st, i + 1)

    dt, (state, _) = chain_time(gupd, (state, jnp.int32(900)), n=5)
    emit("grid_update", dt, amortized_ms=round(dt * 1e3 / 16, 2))

    batch = sample_batch(jax.random.fold_in(key, 5), scene, R)
    poses = scene["poses"][batch["img_idxs"]]
    dirs = scene["directions"][batch["pix_idxs"]]
    rays_o, rays_d = get_rays(dirs, poses)
    rays_du = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    hits = clamp_near(ray_aabb_intersect(rays_o, rays_du, jnp.zeros(3),
                                         jnp.full((3,), 0.5)), 0.05)
    occ_blocks = state["occ_u8"]
    occ2 = pack_occupancy_block2(state["occ"], max_samples=1024, scale=0.5)
    mkw = dict(scale=0.5, grid_size=128, max_samples=1024, k_samples=K)

    @jax.jit
    def march_step(c):
        noise = jax.random.uniform(jax.random.fold_in(key, c[0]), (R,))
        m = march_rays_train_block(rays_o, rays_du, hits, occ_blocks,
                                   noise=noise, **mkw)
        return (c[0] + 1, m["ts"][:, 0] + 0 * c[1])

    dt, _ = chain_time(march_step, (jnp.int32(0), jnp.zeros(R)), n=10)
    emit("march_block", dt)

    @jax.jit
    def march2_step(c):
        noise = jax.random.uniform(jax.random.fold_in(key, c[0]), (R,))
        m = march_rays_train_block2(rays_o, rays_du, hits, occ2,
                                    noise=noise, n_keep_super=8, **mkw)
        return (c[0] + 1, m["ts"][:, 0] + 0 * c[1])

    dt, _ = chain_time(march2_step, (jnp.int32(0), jnp.zeros(R)), n=10)
    emit("march_block2", dt)

    noise = jax.random.uniform(key, (R,))
    m = jax.jit(lambda: march_rays_train_block(
        rays_o, rays_du, hits, occ_blocks, noise=noise, **mkw))()

    @jax.jit
    def plan_step(c):
        plan = plan_packing(m["valid"] ^ (c[1][:1, :1] > 1e9), B,
                            sample_major=False)
        return (c[0] + 1, m["valid"] | (plan.src_idx[0] > 0))

    dt, _ = chain_time(plan_step, (jnp.int32(0), jnp.zeros((R, K), bool)),
                       n=10)
    emit("plan_rowmajor", dt, slots=R * K)

    plan = plan_packing(m["valid"], B, sample_major=False)
    feat = jnp.concatenate(
        [m["xyzs"].reshape(-1, 3), m["dirs"].reshape(-1, 3),
         m["deltas"].reshape(-1, 1), m["ts"].reshape(-1, 1)], axis=1)
    fp = pack(feat, plan)
    x01 = jnp.clip(fp[:, :3] + 0.5, 0.0, 1.0)
    table = state["params"]["packed_table"]
    pcfg = model.packed_cfg
    g = jax.random.normal(key, (B, pcfg.out_dim))

    @jax.jit
    def enc_bwd(c):
        grads = jax.grad(lambda t: jnp.vdot(
            packed_hash_encode(t, x01, pcfg), g))(table + c[0] * 0)
        return (grads[0, 0, :1] * 0, grads[0, 0])

    dt, _ = chain_time(enc_bwd, (jnp.zeros(1), jnp.zeros(pcfg.row_width)),
                       n=10)
    emit("encoder_fb", dt, rows=B * pcfg.n_levels)

    g3 = jax.random.normal(key, (B, 3))

    @jax.jit
    def field_fb(c):
        params = dict(state["params"])
        params["packed_table"] = params["packed_table"] + c[0] * 0

        def loss(p):
            s, col = ngp_apply(p, model, fp[:, :3], fp[:, 3:6])
            return jnp.sum(s) + jnp.vdot(col, g3)

        grads = jax.grad(loss)(params)
        return (grads["packed_table"][0, 0, :1] * 0,
                grads["rgb_mlp"][0][0, 0])

    dt, _ = chain_time(field_fb, (jnp.zeros(1), jnp.zeros(())), n=10)
    emit("field_fb", dt)

    sig_p = jnp.abs(jax.random.normal(key, (B,)))
    col_p = jax.random.uniform(key, (B, 3))
    gt = batch["rgb"]

    @jax.jit
    def comp_fb(c):
        def loss(sp):
            out = composite_stream_train(plan, sp, col_p, fp[:, 6],
                                         fp[:, 7], R, K, 1e-4)
            return jnp.mean((out["rgb"] - gt) ** 2)

        gr = jax.grad(loss)(sig_p + c[0] * 0)
        return (gr[:1] * 0, gr[0])

    dt, _ = chain_time(comp_fb, (jnp.zeros(1), jnp.zeros(())), n=10)
    emit("stream_composite_fb", dt)

    # full render_train fwd+bwd (march+plan+pack+field+composite) to
    # expose what the component sum misses (scheduler overlap)
    @jax.jit
    def rt_fb(c):
        params = dict(state["params"])
        params["packed_table"] = params["packed_table"] + c[0] * 0

        def loss(p):
            out = render_train(
                p, model, state["occ"], rays_o, rays_d,
                jax.random.fold_in(key, 7), k_samples=K, max_samples=1024,
                samples_budget=B, occ_u8=occ_blocks, march="block",
                exclude_incomplete="backfill", backfill_rgb=gt,
                backfill_enable=jnp.asarray(True))
            return jnp.mean((out["rgb"] - gt) ** 2)

        grads = jax.grad(loss)(params)
        return (grads["packed_table"][0, 0, :1] * 0,
                grads["rgb_mlp"][0][0, 0])

    dt, _ = chain_time(rt_fb, (jnp.zeros(1), jnp.zeros(())), n=10)
    emit("render_train_fb", dt)
    print("DONE")


if __name__ == "__main__":
    main()
