"""Per-grid-step cost breakdown of the MXU brick-field kernels.

The R3.2.2 FLOP budget assumed the frame cost is the one-hot matmul
(171 TFLOP -> "85% MXU utilization"), but that read pairs_rendered
(hit-ray events) as pair count.  This probe separates the three candidate
walls on SYNTHETIC lists with CONTROLLED hit density:

  miss   every (tile, slot) step's `work` gate is FALSE (rays point away)
         -> pure grid sequencing + slab DMA + slab-test cost per step
  hit    every step's gate is TRUE and all 64 rays hit
         -> + full body (one-hot construct, matmuls, MLP, composite)
  sig    sigma prepass kernel, all-hit -> the 16x narrower body

Per-variant timing at T tiles x L slots gives us/step; (hit - miss) is
the body, miss is the floor a step-count reduction (prepass compaction,
banding) can save.  Timing law: chained carry + host scalar fetch.

Run ON CHIP: python tools/kernel_cost_probe.py [variants...]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)


def build_inputs(T=512, L=64, n_blocks=2048, hit=True, seed=0,
                 dtype=jnp.float8_e4m3fn):
    """Lists point at random pool blocks; bricks sit along each tile's
    ray direction (hit) or behind the origin (miss)."""
    rng = np.random.RandomState(seed)
    V, s, Bk = 512, 0.5, 8
    vox = Bk ** 3
    poolT = jnp.asarray(
        rng.randn(n_blocks, 128, vox).astype(np.float32) * 0.05 - 2.0,
        dtype=dtype)
    pool_blk = jnp.asarray(
        rng.randint(0, n_blocks, T * L).astype(np.int32))
    # brick AABBs: a voxel-8 cube near the ray path (z in [0.1, 0.4])
    z = rng.uniform(0.05, 0.35, (T * L, 1)).astype(np.float32)
    xy = rng.uniform(-0.05, 0.05, (T * L, 2)).astype(np.float32)
    lo = np.concatenate([xy, z], 1)
    wid = 2.0 * s * Bk / V
    meta = np.zeros((T * L, 8), np.float32)
    meta[:, 0:3] = lo
    meta[:, 3:6] = lo + wid
    if not hit:
        meta[:, 2] = -2.0      # bricks behind every ray: tb < ta
        meta[:, 5] = -1.9
    # rays: 64 per tile from z=-1 toward +z, small jitter
    o = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (T * 64, 1))
    d = np.stack([rng.uniform(-0.06, 0.06, T * 64),
                  rng.uniform(-0.06, 0.06, T * 64),
                  np.ones(T * 64)], -1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((T * 64, 1), 0.3, np.float32),
         np.full((T * 64, 1), 2.5, np.float32)], -1)
    sh = rng.randn(T * 64, 16).astype(np.float32) * 0.3
    key = jax.random.PRNGKey(1)
    from google_nerf_tpu.models.mlp import init_mlp
    w1, w2, w3 = init_mlp(key, [32, 64, 64, 3])
    kw = dict(dt=float(np.sqrt(3) / 512), inv2s=1.0, V=V,
              tau_max=float(-np.log(1e-2)), Bk=Bk)
    return (pool_blk, jnp.asarray(meta), jnp.asarray(rays),
            jnp.asarray(sh), poolT, w1, w2, w3), kw


def chain_time(fn, n_iter=6):
    out = fn(0.0)
    c = out.ravel()[0] * 0.0
    _ = float(c)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        c = fn(c).ravel()[0] * 0.0
    _ = float(c)
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    from google_nerf_tpu.ops.pallas.brick_field import (
        brick_field_tiles_t, brick_field_tiles_tp, window_span)
    T, L = 512, 64
    S = window_span(512, 8, 512, 0.5)
    names = sys.argv[1:] or ["tp8_miss", "tp8_hit", "tp8_half",
                             "t_hit", "tp8_hit_s5"]
    for name in names:
        kind, mode = name.split("_", 1)[0], name.split("_", 1)[1]
        hit = not mode.startswith("miss")
        dtype = jnp.bfloat16 if mode.endswith("bf16") else jnp.float8_e4m3fn
        args, kw = build_inputs(T=T, L=L, hit=hit, dtype=dtype)
        if mode.endswith("same"):
            # every list row points at block 0: consecutive equal block
            # indices let the Mosaic pipeline SKIP the slab DMA — this is
            # the pure grid-sequencing floor
            args = (jnp.zeros_like(args[0]),) + args[1:]
        kw["S"] = 5 if "s5" in mode else S
        pool_blk, meta, rays, sh, poolT, w1, w2, w3 = args
        if mode == "half":      # half the slots miss (interleaved)
            m2 = np.asarray(meta).copy()
            m2[::2, 2] = -2.0
            m2[::2, 5] = -1.9
            meta = jnp.asarray(m2)
        if kind == "sig8":
            print(f"{name}: sigma prepass kernel deleted in r4 "
                  "(DESIGN_NOTES R4.4)")
            continue
        elif kind == "t":
            def fn(c, a=(pool_blk, meta, rays, sh, poolT, w1, w2, w3),
                   kw=kw):
                return brick_field_tiles_t(
                    a[0], a[1], a[2] + c, *a[3:], **kw)
        else:
            P = int(kind[2:])

            def fn(c, a=(pool_blk, meta, rays, sh, poolT, w1, w2, w3),
                   P=P, kw=kw):
                return brick_field_tiles_tp(
                    a[0], a[1], a[2] + c, *a[3:], P=P, **kw)
        try:
            t0 = time.time()
            ms = chain_time(fn)
            us_step = ms * 1e3 / (T * L)
            print(f"{name}: {ms:.1f} ms for {T}x{L} steps = "
                  f"{us_step:.3f} us/slot (first call {time.time()-t0:.0f}s)")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}"[:300])
    print("DONE")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
