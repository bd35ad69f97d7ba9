"""Component-level timing of the train step on real hardware.

Usage: python tools/profile_step.py
"""
import time, functools
print = functools.partial(print, flush=True)

import jax
import jax.numpy as jnp

from google_nerf_tpu.data.synthetic import SyntheticDataset
from google_nerf_tpu.models.ngp import NGPConfig, init_ngp, ngp_apply
from google_nerf_tpu.models.rendering import render_train
from google_nerf_tpu.ops.marching import march_rays_train
from google_nerf_tpu.ops.compaction import plan_packing, pack
from google_nerf_tpu.ops.table_gather import table_gather
from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                          grid_update_step, init_train_state,
                                          sample_batch)


def timeit(fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    model = NGPConfig(scale=0.5, encoder="hash", num_levels=16,
                      log2_hashmap_size=19, grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=128,
                      num_epochs=30, samples_budget=131072)
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256))
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)

    # converge grid a bit for realistic sparsity
    for i in range(96):
        if i % cfg.grid_update_interval == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 2*i+1),
                                     cfg=cfg, warmup=i < cfg.warmup_steps)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, 2*i),
                                          cfg=cfg)
    jax.block_until_ready(state)
    print("s_per_ray:", float(metrics["s_per_ray"]))

    # --- full step ---
    def full(state):
        s, m = fused_train_step(state, scene, jax.random.fold_in(key, 1),
                                cfg=cfg)
        return m["loss"]
    # don't donate repeatedly: copy state? fused donates state; run on fresh
    st2 = jax.tree.map(lambda x: x + 0 if hasattr(x, "dtype") else x, state)
    t_full = timeit(lambda: fused_train_step(
        jax.tree.map(jnp.copy, st2), scene, jax.random.fold_in(key, 1),
        cfg=cfg)[1]["loss"], n=5)
    print(f"full step:           {t_full*1e3:8.2f} ms")

    # --- grid update ---
    t_grid = timeit(lambda: grid_update_step(
        jax.tree.map(jnp.copy, st2), jax.random.fold_in(key, 3), cfg=cfg,
        warmup=False)["occ"], n=5)
    print(f"grid update (S=16):  {t_grid*1e3:8.2f} ms (amortized /16: {t_grid/16*1e3:.2f})")

    # components
    batch = sample_batch(jax.random.fold_in(key, 5), scene, cfg.batch_size)
    from google_nerf_tpu.core.rays import get_rays
    poses = scene["poses"][batch["img_idxs"]]
    dirs = scene["directions"][batch["pix_idxs"]]
    rays_o, rays_d = get_rays(dirs, poses)
    rays_du = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    from google_nerf_tpu.ops.ray_aabb import ray_aabb_intersect, clamp_near
    hits = clamp_near(ray_aabb_intersect(rays_o, rays_du, jnp.zeros(3),
                                         jnp.full((3,), 0.5)), 0.05)
    noise = jax.random.uniform(key, (rays_o.shape[0],))

    march = jax.jit(lambda: march_rays_train(
        rays_o, rays_du, hits, st2["occ"], cascades=model.cascades,
        scale=model.scale, exp_step_factor=0.0, grid_size=128,
        max_samples=1024, k_samples=128, noise=noise))
    t_march = timeit(march, n=8)
    m = march()
    print(f"march_rays_train:    {t_march*1e3:8.2f} ms  (total_samples={int(m['total_samples'])})")

    t_plan = timeit(jax.jit(lambda: plan_packing(m["valid"], 131072)), n=8)
    print(f"plan_packing:        {t_plan*1e3:8.2f} ms")

    plan = plan_packing(m["valid"], 131072)
    xp = pack(m["xyzs"].reshape(-1, 3), plan)
    dp = pack(m["dirs"].reshape(-1, 3), plan)

    # fwd+bwd of the field network on budget samples
    def field_loss(params):
        s, c = ngp_apply(params, model, xp, dp)
        return jnp.sum(s) + jnp.sum(c)
    vg = jax.jit(jax.value_and_grad(field_loss))
    t_field = timeit(lambda: vg(st2["params"]), n=5)
    print(f"field fwd+bwd (131k):{t_field*1e3:8.2f} ms")

    fwd = jax.jit(lambda: ngp_apply(st2["params"], model, xp, dp))
    t_fwd = timeit(fwd, n=8)
    print(f"field fwd only:      {t_fwd*1e3:8.2f} ms")

    # hash gather bwd alone: 131072 samples * 16 levels * 8 corners
    n = 131072 * 16 * 8
    idx = jax.random.randint(jax.random.fold_in(key, 7), (n,), 0,
                             (1 << 19) * 16)
    tbl = st2["params"]["hash_table"].reshape(-1, 2)
    def tg_loss(t):
        return jnp.sum(table_gather(t, idx))
    t_tg = timeit(jax.jit(jax.grad(tg_loss)), tbl, n=5)
    print(f"table_gather bwd ({n/1e6:.1f}M rows): {t_tg*1e3:8.2f} ms")

    # full render_train fwd+bwd
    def rt_loss(params):
        out = render_train(params, model, st2["occ"], rays_o, rays_d,
                           jax.random.fold_in(key, 9), k_samples=128,
                           samples_budget=131072)
        return jnp.mean((out["rgb"] - batch["rgb"]) ** 2)
    t_rt = timeit(jax.jit(jax.value_and_grad(rt_loss)), st2["params"], n=5)
    print(f"render_train f+b:    {t_rt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
