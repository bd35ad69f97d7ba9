"""Component breakdown of the redesigned train step on TPU (chained)."""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def chain_time(step_fn, carry0, n=10, fetch=None):
    c = step_fn(carry0)
    _ = float((fetch(c) if fetch else jax.tree.leaves(c)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        c = step_fn(c)
    _ = float((fetch(c) if fetch else jax.tree.leaves(c)[0]).ravel()[0])
    return (time.perf_counter() - t0) / n, c


def main():
    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.ngp import NGPConfig, ngp_apply
    from google_nerf_tpu.ops.compaction import pack, plan_packing
    from google_nerf_tpu.ops.grid import pack_occupancy_u8
    from google_nerf_tpu.ops.march_seg import (march_rays_train_seg,
                                               required_dilation_radius)
    from google_nerf_tpu.ops.packed_hash import packed_hash_encode
    from google_nerf_tpu.ops.ray_aabb import clamp_near, ray_aabb_intersect
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state, sample_batch)

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=64,
                      num_epochs=30, samples_budget=131072)
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256))
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    for i in range(96):
        if i % 16 == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 991 + i),
                                     cfg=cfg, warmup=i < 256)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, i), cfg=cfg)
    print(f"warmed s_per_ray={float(metrics['s_per_ray']):.1f}")

    batch = sample_batch(jax.random.fold_in(key, 5), scene, cfg.batch_size)
    poses = scene["poses"][batch["img_idxs"]]
    dirs = scene["directions"][batch["pix_idxs"]]
    rays_o, rays_d = get_rays(dirs, poses)
    rays_du = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    hits = clamp_near(ray_aabb_intersect(rays_o, rays_du, jnp.zeros(3),
                                         jnp.full((3,), 0.5)), 0.05)
    occ_u8 = state["occ_u8"]

    # march
    @jax.jit
    def march_step(c):
        noise = jax.random.uniform(jax.random.fold_in(key, c[0]), (8192,))
        m = march_rays_train_seg(rays_o, rays_du, hits, occ_u8, cascades=1,
                                 scale=0.5, grid_size=128, max_samples=1024,
                                 k_samples=64, noise=noise, seg=8, n_keep=32)
        return (c[0] + 1, m["ts"][:, 0] + 0 * c[1])

    dt, (_, _) = chain_time(march_step, (jnp.int32(0), jnp.zeros(8192)), n=10)
    print(f"march_seg:        {dt*1e3:7.1f} ms")

    noise = jax.random.uniform(key, (8192,))
    m = jax.jit(lambda: march_rays_train_seg(
        rays_o, rays_du, hits, occ_u8, cascades=1, scale=0.5, grid_size=128,
        max_samples=1024, k_samples=64, noise=noise, seg=8, n_keep=32))()

    @jax.jit
    def plan_step(c):
        plan = plan_packing(m["valid"] ^ (c[1][:1, :1] > 1e9), 131072)
        return (c[0] + 1, m["valid"] | (plan.src_idx[0] > 0))

    dt, _ = chain_time(plan_step, (jnp.int32(0),
                                   jnp.zeros((8192, 64), bool)), n=10)
    print(f"plan_packing:     {dt*1e3:7.1f} ms")

    plan = plan_packing(m["valid"], 131072)
    xp = pack(m["xyzs"].reshape(-1, 3), plan)
    x01 = jnp.clip((xp + 0.5) / 1.0, 0.0, 1.0)
    table = state["params"]["packed_table"]
    pcfg = model.packed_cfg

    @jax.jit
    def enc_fwd(c):
        out = packed_hash_encode(table + c[0] * 0, x01, pcfg)
        return (out.sum(0)[:1] * 0, out[0])

    dt, _ = chain_time(enc_fwd, (jnp.zeros(1), jnp.zeros(pcfg.out_dim)),
                       n=10)
    print(f"encode fwd:       {dt*1e3:7.1f} ms")

    g = jax.random.normal(key, (131072, pcfg.out_dim))

    @jax.jit
    def enc_bwd(c):
        grads = jax.grad(lambda t: jnp.vdot(
            packed_hash_encode(t, x01, pcfg), g))(table + c[0] * 0)
        return (grads[0, 0, :1] * 0, grads[0, 0])

    dt, _ = chain_time(enc_bwd, (jnp.zeros(1), jnp.zeros(pcfg.row_width)),
                       n=10)
    print(f"encode fwd+bwd:   {dt*1e3:7.1f} ms")

    dp = pack(m["dirs"].reshape(-1, 3), plan)

    @jax.jit
    def field_fb(c):
        params = dict(state["params"])
        params["packed_table"] = params["packed_table"] + c[0] * 0

        def loss(p):
            s, col = ngp_apply(p, model, xp, dp)
            return jnp.sum(s) + jnp.vdot(col, g[:, :3])

        grads = jax.grad(loss)(params)
        return (grads["packed_table"][0, 0, :1] * 0,
                grads["rgb_mlp"][0][0, 0])

    dt, _ = chain_time(field_fb, (jnp.zeros(1), jnp.zeros(())), n=10)
    print(f"full field f+b:   {dt*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
