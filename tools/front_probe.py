"""Stage-wise timing of the brick raster FRONT-END at real 800^2 frame
shapes — the L8 kernel probe (fps_mxu2 tp8_L8_front) bounded the whole
front-end at ~250 ms/frame, now the largest cost component.  Times each
stage separately (chained + scalar fetch), per chunk x 20 chunks.

Run on chip: python tools/front_probe.py
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)


def chain_ms(fn, arg, n=10):
    out = fn(arg)
    c = jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0.0
    _ = float(c)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(arg + c)
        c = jax.tree_util.tree_leaves(out)[0].ravel()[0] * 0.0
    _ = float(c)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.baked import BakedConfig, bake
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.models.render_brick import (_refine_lists,
                                                     _tile_cones,
                                                     _tile_lists,
                                                     brick_geometry,
                                                     tile_order)
    from google_nerf_tpu.models.render_brick_mxu import _exact_hit_filter
    from google_nerf_tpu.ops.ray_aabb import clamp_near, ray_aabb_intersect
    from google_nerf_tpu.train.system import TrainConfig, init_train_state

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=256,
                      num_epochs=30, samples_budget=131072,
                      random_bg=True, exclude_incomplete="backfill",
                      march="block")
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style="textured")
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    z = np.load("/tmp/bench_state_textured.npz")
    flat, tree = jax.tree_util.tree_flatten(state["params"])
    params = jax.tree_util.tree_unflatten(
        tree, [jnp.asarray(z[f"p{i}"]).astype(l.dtype)
               for i, l in enumerate(flat)])
    occ = jnp.asarray(z["occ"])
    bcfg = BakedConfig(voxel_res=512, block=8, dtype="bfloat16")
    baked = bake(params, model, occ, bcfg)
    lo, hi, _ = brick_geometry(baked["block_map"], bcfg, model)
    print(f"bricks: {lo.shape[0]}")

    ds_t = SyntheticDataset(split="test", n_images=1, img_wh=(800, 800),
                            style="textured")
    o, d = get_rays(jnp.asarray(ds_t.directions),
                    jnp.asarray(ds_t.poses[0]))
    perm, inv = tile_order(800, 800, 8)
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    rdu = d / jnp.where(norm > 0, norm, 1.0)
    ro_t = jnp.take(o, perm, axis=0)
    rd_t = jnp.take(rdu, perm, axis=0)
    T, mt, mL, Lw, Le = 512, 8, 1024, 192, 48
    n_chunks = 20
    sl = slice(0, T * 64)
    ro_c, rd_c = ro_t[sl], rd_t[sl]
    dt = float(np.sqrt(3) / 256)

    hits = clamp_near(ray_aabb_intersect(ro_c, rd_c, jnp.zeros(3),
                                         jnp.full((3,), 0.5)), 0.05)
    t2v = jnp.where(hits[:, 1] > 0, hits[:, 1], 0.0)
    t1v = jnp.where(hits[:, 0] >= 0, jnp.maximum(hits[:, 0], 0.0), 0.0)

    @jax.jit
    def st_cones(rc):
        o_t, ax, tn = _tile_cones(ro_c + 0 * rc[:1], rc, T, 64)
        om, am, tm = _tile_cones(ro_c + 0 * rc[:1], rc, T // mt, 64 * mt)
        return o_t, ax, tn, om, am, tm

    o_t, ax, tn, om, am, tm = st_cones(rd_c)
    t_far = t2v.reshape(T, 64).max(-1)
    t_far_m = t_far.reshape(T // mt, mt).max(-1)
    ms = chain_ms(lambda c: st_cones(rd_c + c)[1], 0.0)
    print(f"cones:        {ms * n_chunks:.1f} ms/frame")

    @jax.jit
    def st_macro(c):
        return _tile_lists(lo + c, hi, om, am, tm, t_far_m, L=mL)[0]

    midx = st_macro(0.0)
    print(f"macro cull:   {chain_ms(st_macro, 0.0) * n_chunks:.1f} ms/frame")

    @jax.jit
    def st_refine(c):
        return _refine_lists(lo + c, hi, midx, o_t, ax, tn, t_far,
                             mt=mt, L=Lw)[0]

    bidx = st_refine(0.0)
    print(f"refine(192):  {chain_ms(st_refine, 0.0) * n_chunks:.1f} ms/frame")

    @jax.jit
    def st_depth(c):
        safe = jnp.maximum(bidx, 0)
        cc = 0.5 * (lo + hi)[safe] + c
        t_c = jnp.sum((cc - o_t[:, None, :]) * ax[:, None, :], -1)
        key = jnp.where(bidx >= 0, t_c, jnp.inf)
        return jax.lax.sort((key, bidx), dimension=1, num_keys=1)[1]

    bidx_d = st_depth(0.0)
    print(f"depth rekey:  {chain_ms(st_depth, 0.0) * n_chunks:.1f} ms/frame")

    @jax.jit
    def st_exact(c):
        return _exact_hit_filter(bidx_d, lo + c, hi,
                                 ro_c.reshape(T, 64, 3),
                                 rd_c.reshape(T, 64, 3),
                                 t1v.reshape(T, 64), t2v.reshape(T, 64),
                                 dt, Le)[0]

    print(f"exact filter: {chain_ms(st_exact, 0.0) * n_chunks:.1f} ms/frame")

    @jax.jit
    def st_aabb(c):
        h = clamp_near(ray_aabb_intersect(ro_t + c, rd_t, jnp.zeros(3),
                                          jnp.full((3,), 0.5)), 0.05)
        return h

    print(f"ray aabb(all):{chain_ms(st_aabb, 0.0):.1f} ms/frame")

    @jax.jit
    def st_perm(c):
        return jnp.take(o + c, perm, axis=0)

    print(f"permute:      {chain_ms(st_perm, 0.0) * 2:.1f} ms/frame (x2)")
    print("DONE")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
