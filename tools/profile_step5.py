"""Component breakdown of the BLOCK-MARCH flagship train step (k=256,
block-row marcher, ray-major budget 131k) on the real chip — chained timing.

Successor to profile_step4 (which profiles the 3-phase segment marcher);
this matches bench.py's current flagship config exactly.
"""
import functools
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


def main():
    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.ngp import NGPConfig, ngp_apply
    from google_nerf_tpu.ops.compaction import pack, plan_packing, unpack
    from google_nerf_tpu.ops.composite import composite_rays_train
    from google_nerf_tpu.ops.march_block import (block_group,
                                                 march_rays_train_block)
    from google_nerf_tpu.ops.packed_hash import packed_hash_encode
    from google_nerf_tpu.ops.ray_aabb import clamp_near, ray_aabb_intersect
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state, sample_batch)

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=256,
                      num_epochs=30, samples_budget=131072, random_bg=True,
                      exclude_incomplete="backfill", march="block")
    R, K, B = cfg.batch_size, cfg.k_samples, cfg.samples_budget
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256))
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    for i in range(512):
        if i % 16 == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 991 + i),
                                     cfg=cfg, warmup=i < 256)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, i), cfg=cfg)
    print(f"warmed s_per_ray={float(metrics['s_per_ray']):.1f} "
          f"occ={float(state['occ'].mean()):.3f}")

    # ---- end-to-end step ----
    def e2e(c):
        st, i = c
        st, _ = fused_train_step(st, scene, jax.random.fold_in(key, i),
                                 cfg=cfg)
        return (st, i + 1)

    dt, (state, _) = chain_time(e2e, (state, jnp.int32(600)), n=20)
    print(f"fused step e2e:   {dt*1e3:7.1f} ms  "
          f"({cfg.batch_size/dt:,.0f} rays/s)")

    def gupd(c):
        st, i = c
        st = grid_update_step(st, jax.random.fold_in(key, i), cfg=cfg,
                              warmup=False)
        return (st, i + 1)

    dt, (state, _) = chain_time(gupd, (state, jnp.int32(900)), n=5)
    print(f"grid update:      {dt*1e3:7.1f} ms (every 16 steps -> "
          f"{dt*1e3/16:.1f} ms/step amortised)")

    batch = sample_batch(jax.random.fold_in(key, 5), scene, R)
    poses = scene["poses"][batch["img_idxs"]]
    dirs = scene["directions"][batch["pix_idxs"]]
    rays_o, rays_d = get_rays(dirs, poses)
    rays_du = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    hits = clamp_near(ray_aabb_intersect(rays_o, rays_du, jnp.zeros(3),
                                         jnp.full((3,), 0.5)), 0.05)
    occ_blocks = state["occ_u8"]   # block words when cfg.march == "block"
    ms = cfg.max_samples
    g = block_group(ms, 0.5, 128)
    print(f"block marcher: group={g}, rows/ray={ms // g}")

    @jax.jit
    def march_step(c):
        noise = jax.random.uniform(jax.random.fold_in(key, c[0]), (R,))
        m = march_rays_train_block(rays_o, rays_du, hits, occ_blocks,
                                   scale=0.5, grid_size=128, max_samples=ms,
                                   k_samples=K, noise=noise)
        return (c[0] + 1, m["ts"][:, 0] + 0 * c[1])

    dt, _ = chain_time(march_step, (jnp.int32(0), jnp.zeros(R)), n=10)
    print(f"march_block:      {dt*1e3:7.1f} ms")

    noise = jax.random.uniform(key, (R,))
    m = jax.jit(lambda: march_rays_train_block(
        rays_o, rays_du, hits, occ_blocks, scale=0.5, grid_size=128,
        max_samples=ms, k_samples=K, noise=noise))()

    @jax.jit
    def plan_step(c):
        plan = plan_packing(m["valid"] ^ (c[1][:1, :1] > 1e9), B,
                            sample_major=False)
        return (c[0] + 1, m["valid"] | (plan.src_idx[0] > 0))

    dt, _ = chain_time(plan_step, (jnp.int32(0), jnp.zeros((R, K), bool)),
                       n=10)
    print(f"plan_packing:     {dt*1e3:7.1f} ms   (over {R*K/1e6:.1f}M slots)")

    plan = plan_packing(m["valid"], B, sample_major=False)
    xp = pack(m["xyzs"].reshape(-1, 3), plan)
    dp = pack(m["dirs"].reshape(-1, 3), plan)
    x01 = jnp.clip(xp + 0.5, 0.0, 1.0)
    table = state["params"]["packed_table"]
    pcfg = model.packed_cfg
    gld = jax.random.normal(key, (B, pcfg.out_dim))

    @jax.jit
    def enc_bwd(c):
        grads = jax.grad(lambda t: jnp.vdot(
            packed_hash_encode(t, x01, pcfg), gld))(table + c[0] * 0)
        return (grads[0, 0, :1] * 0, grads[0, 0])

    dt, _ = chain_time(enc_bwd, (jnp.zeros(1), jnp.zeros(pcfg.row_width)),
                       n=10)
    print(f"encode f+b:       {dt*1e3:7.1f} ms   ({B/1e3:.0f}k x "
          f"{pcfg.n_levels} rows)")

    @jax.jit
    def enc_fwd(c):
        out = packed_hash_encode(table + c[0] * 0, x01, pcfg)
        return (out[0, :1] * 0, out[0, 0])

    dt, _ = chain_time(enc_fwd, (jnp.zeros(1), jnp.zeros(())), n=10)
    print(f"encode fwd only:  {dt*1e3:7.1f} ms")

    @jax.jit
    def field_fb(c):
        params = dict(state["params"])
        params["packed_table"] = params["packed_table"] + c[0] * 0

        def loss(p):
            s, col = ngp_apply(p, model, xp, dp)
            return jnp.sum(s) + jnp.vdot(col, gld[:, :3])

        grads = jax.grad(loss)(params)
        return (grads["packed_table"][0, 0, :1] * 0,
                grads["rgb_mlp"][0][0, 0])

    dt, _ = chain_time(field_fb, (jnp.zeros(1), jnp.zeros(())), n=10)
    print(f"field f+b:        {dt*1e3:7.1f} ms   (enc+MLPs on {B/1e3:.0f}k)")

    sig_p = jnp.abs(jax.random.normal(key, (B,)))
    col_p = jax.random.uniform(key, (B, 3))
    gt = batch["rgb"]

    @jax.jit
    def comp_fb(c):
        def loss(sp):
            sig = unpack(sp, plan).reshape(R, K)
            col = unpack(col_p, plan).reshape(R, K, 3)
            out = composite_rays_train(sig, col, m["deltas"], m["ts"],
                                       m["valid"], 1e-4)
            return jnp.mean((out["rgb"] - gt) ** 2)

        gr = jax.grad(loss)(sig_p + c[0] * 0)
        return (gr[:1] * 0, gr[0])

    dt, _ = chain_time(comp_fb, (jnp.zeros(1), jnp.zeros(())), n=10)
    print(f"unpack+composite: {dt*1e3:7.1f} ms   (padded {R}x{K})")
    print("DONE")


if __name__ == "__main__":
    main()
