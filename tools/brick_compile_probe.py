"""Bisect which subgraph of the brick renderer explodes CPU compile time.

The 64x64 smoke with bake_res=64 (465 bricks, L=256, S=65) compiled for
>50 min on CPU while the 16x16 unit tests compile in ~1 min.  Lower+
compile each stage separately at the smoke shapes and time it.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")
print = functools.partial(print, flush=True)


def t(name, fn, *args, **kw):
    t0 = time.time()
    lowered = jax.jit(fn, **kw).lower(*args)
    t1 = time.time()
    compiled = lowered.compile()
    t2 = time.time()
    print(f"{name:28s} lower {t1-t0:6.1f}s  compile {t2-t1:7.1f}s")
    return compiled


def main():
    from google_nerf_tpu.models.render_brick import (_pair_field,
                                                     _pair_windows,
                                                     _tile_cones, _tile_lists)
    from google_nerf_tpu.ops.compaction import pack, plan_packing

    key = jax.random.PRNGKey(0)
    T, tpx, R = 64, 64, 4096
    Nb, L, Lk = 465, 256, 24
    S, F, P = 65, 16, 12288
    V, Bk = 64, 8

    o = jax.random.normal(key, (T, 3))
    axis = jax.random.normal(key, (T, 3))
    tan = jnp.abs(jax.random.normal(key, (T,)))
    tf = jnp.abs(jax.random.normal(key, (T,)))
    lo = jax.random.uniform(key, (Nb, 3), minval=-0.5, maxval=0.4)
    hi = lo + 0.1
    pb = jnp.arange(Nb, dtype=jnp.int32) * (Bk ** 3)

    t("tile_lists(L=256)", lambda *a: _tile_lists(*a, L=L),
      lo, hi, o, axis, tan, tf)

    ro = jax.random.normal(key, (R, 3))
    rd = jax.random.normal(key, (R, 3))
    t1_ = jnp.zeros(R)
    t2_ = jnp.ones(R)
    bidx = jnp.zeros((T, L), jnp.int32)
    t("pair_windows", lambda *a: _pair_windows(*a, tpx, 0.01),
      ro, rd, t1_, t2_, lo, hi, pb, bidx)

    n0 = jax.random.randint(key, (R, L), 0, 1000)
    n1 = n0 + 3
    pbr = jnp.zeros((R, L), jnp.int32)
    t("topk(Lk=24) over (R,256)",
      lambda n0, n1, pbr: (lambda neg, sel:
                           (-neg, jnp.take_along_axis(n1, sel, 1),
                            jnp.take_along_axis(pbr, sel, 1)))(
          *jax.lax.top_k(-n0, Lk)), n0, n1, pbr)

    mask = jax.random.bernoulli(key, 0.3, (R, Lk))
    t("plan_packing(R*Lk->P)",
      lambda m: plan_packing(m, P, sample_major=False).slot_valid, mask)

    pool = jax.random.normal(key, (Nb * Bk ** 3, 8 * F), jnp.float32) \
        .astype(jnp.bfloat16)
    rgb_mlp = [jnp.zeros((16 + F, 64), jnp.float32),
               jnp.zeros((64, 64), jnp.float32),
               jnp.zeros((64, 3), jnp.float32)]
    p_n0 = jnp.zeros(P, jnp.int32)
    p_n1 = jnp.full((P,), S - 1, jnp.int32)
    p_pb = jnp.zeros(P, jnp.int32)
    p_ray = jnp.zeros(P, jnp.int32)
    sv = jnp.ones(P, bool)
    t("pair_field(P=12288,S=65)",
      lambda *a: _pair_field(*a, dt=0.003, S=S, V=V, Bk=Bk, s=0.5, F=F),
      pool, rgb_mlp, ro, rd, t1_, p_n0, p_n1, p_pb, p_ray, sv)
    print("DONE")


if __name__ == "__main__":
    main()
