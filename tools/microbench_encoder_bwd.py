"""Encoder fwd/bwd variant shoot-out on the real chip.

The end-to-end A/B showed a 10x step regression after the per-level
forward split + batched per-level backward sort landed together
(738.8 vs 70.4 ms/step at the flagship T=2^16 recipe).  This isolates
which piece regressed by timing, at flagship shapes (N=131072 samples,
L=8, T=2^16, W=16):

  fwd_concat   one take over the (L*T, W) concat        (pre-change)
  fwd_split    one take per level                       (HEAD)
  bwd_flat     flat (L*(N+T),) sort + row gathers       (pre-change)
  bwd_batched  (L, N+T) batched sort + take_along_axis  (HEAD)
  bwd_hybrid   (L, N+T) batched sort + FLAT row gathers
               (lane-offset flattening of every payload gather)

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_encoder_bwd.py
"""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)

from google_nerf_tpu.ops.packed_hash import (PackedHashConfig, _cell_keys,
                                             _corner_weights,
                                             init_packed_hash)

N = 131072
CFG = PackedHashConfig()  # L=8, T=2^16, F=2, bf16 gather


def fwd_concat(table, x, cfg):
    L, T, W = table.shape
    F = cfg.n_features
    keys, frac = _cell_keys(x, cfg)
    gd = jnp.dtype(cfg.table_dtype)
    level_off = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
    rows = jnp.take(table.astype(gd).reshape(L * T, W),
                    (keys + level_off).reshape(-1), axis=0)
    rows = rows.reshape(L, x.shape[0], 8, F).astype(jnp.float32)
    w = _corner_weights(frac)
    feat = jnp.einsum("lnc,lncf->lnf", w, rows)
    return jnp.moveaxis(feat, 0, 1).reshape(x.shape[0], L * F), (keys, w)


def fwd_split(table, x, cfg):
    L, T, W = table.shape
    F = cfg.n_features
    keys, frac = _cell_keys(x, cfg)
    gd = jnp.dtype(cfg.table_dtype)
    rows = jnp.stack([jnp.take(table[l].astype(gd), keys[l], axis=0)
                      for l in range(L)])
    rows = rows.reshape(L, x.shape[0], 8, F).astype(jnp.float32)
    w = _corner_weights(frac)
    feat = jnp.einsum("lnc,lncf->lnf", w, rows)
    return jnp.moveaxis(feat, 0, 1).reshape(x.shape[0], L * F), (keys, w)


def bwd_flat(keys, w, gl, L, T, W, F, n):
    NL = L * n
    LT = L * T
    level_off = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
    k_contrib = (keys + level_off).reshape(-1)
    pos = jnp.arange(NL, dtype=jnp.int32)
    k_all = jnp.concatenate([k_contrib, jnp.arange(LT, dtype=jnp.int32)])
    p_all = jnp.concatenate([pos, jnp.full((LT,), NL, jnp.int32)])
    ks, ps = jax.lax.sort((k_all, p_all), num_keys=2)
    is_contrib = ps < NL
    safe = jnp.where(is_contrib, ps, 0)
    wp = jnp.take(w.reshape(NL, 8), safe, axis=0)
    gp = jnp.take(gl.reshape(NL, F), safe, axis=0)
    payload = (wp[:, :, None] * gp[:, None, :]).reshape(NL + LT, W)
    payload = jnp.where(is_contrib[:, None], payload, 0.0)
    csum = jnp.cumsum(payload, axis=0)
    stream = jnp.arange(NL + LT, dtype=jnp.int32)
    mk = jnp.where(is_contrib, jnp.int32(LT), ks)
    _, mrows = jax.lax.sort((mk, stream), num_keys=1)
    q = jax.lax.dynamic_slice_in_dim(mrows, 0, LT)
    A = jnp.take(csum, q, axis=0)
    dtab = jnp.diff(A, axis=0, prepend=jnp.zeros((1, W), A.dtype))
    return dtab.reshape(L, T, W)


def bwd_batched(keys, w, gl, L, T, W, F, n):
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (L, n))
    marker_k = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (L, T))
    k_all = jnp.concatenate([keys, marker_k], axis=1)
    p_all = jnp.concatenate([pos, jnp.full((L, T), n, jnp.int32)], axis=1)
    ks, ps = jax.lax.sort((k_all, p_all), dimension=1, num_keys=2)
    is_contrib = ps < n
    safe = jnp.where(is_contrib, ps, 0)
    wp = jnp.take_along_axis(w, safe[..., None], axis=1)
    gp = jnp.take_along_axis(gl, safe[..., None], axis=1)
    payload = (wp[..., :, None] * gp[..., None, :]).reshape(L, n + T, W)
    payload = jnp.where(is_contrib[..., None], payload, 0.0)
    csum = jnp.cumsum(payload, axis=1)
    stream = jnp.broadcast_to(jnp.arange(n + T, dtype=jnp.int32), (L, n + T))
    mk = jnp.where(is_contrib, jnp.int32(T), ks)
    _, mrows = jax.lax.sort((mk, stream), dimension=1, num_keys=1)
    q = mrows[:, :T]
    A = jnp.take_along_axis(csum, q[..., None], axis=1)
    dtab = jnp.diff(A, axis=1, prepend=jnp.zeros((L, 1, W), A.dtype))
    return dtab


def bwd_hybrid(keys, w, gl, L, T, W, F, n):
    # batched sort, then FLATTEN every payload gather to a plain row gather
    # by adding lane offsets (lane l rows live at [l*n, (l+1)*n))
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (L, n))
    marker_k = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (L, T))
    k_all = jnp.concatenate([keys, marker_k], axis=1)
    p_all = jnp.concatenate([pos, jnp.full((L, T), n, jnp.int32)], axis=1)
    ks, ps = jax.lax.sort((k_all, p_all), dimension=1, num_keys=2)
    is_contrib = ps < n
    lane_off_n = (jnp.arange(L, dtype=jnp.int32) * n)[:, None]
    safe = (jnp.where(is_contrib, ps, 0) + lane_off_n).reshape(-1)
    wp = jnp.take(w.reshape(L * n, 8), safe, axis=0).reshape(L, n + T, 8)
    gp = jnp.take(gl.reshape(L * n, F), safe, axis=0).reshape(L, n + T, F)
    payload = (wp[..., :, None] * gp[..., None, :]).reshape(L, n + T, W)
    payload = jnp.where(is_contrib[..., None], payload, 0.0)
    csum = jnp.cumsum(payload, axis=1)
    stream = jnp.broadcast_to(jnp.arange(n + T, dtype=jnp.int32), (L, n + T))
    mk = jnp.where(is_contrib, jnp.int32(T), ks)
    _, mrows = jax.lax.sort((mk, stream), dimension=1, num_keys=1)
    lane_off_nt = (jnp.arange(L, dtype=jnp.int32) * (n + T))[:, None]
    q = (mrows[:, :T] + lane_off_nt).reshape(-1)
    A = jnp.take(csum.reshape(L * (n + T), W), q, axis=0).reshape(L, T, W)
    dtab = jnp.diff(A, axis=1, prepend=jnp.zeros((L, 1, W), A.dtype))
    return dtab


def time_fn(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    cfg = CFG
    L, T, F, W = cfg.n_levels, cfg.table_size, cfg.n_features, cfg.row_width
    key = jax.random.PRNGKey(0)
    table = init_packed_hash(key, cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (N, L * F))
    gl = jnp.moveaxis(g.reshape(N, L, F), 1, 0)

    keys, frac = _cell_keys(x, cfg)
    w = _corner_weights(frac)
    keys, w = jax.block_until_ready((keys, w))

    for name, fn in [("fwd_concat", fwd_concat), ("fwd_split", fwd_split)]:
        f = jax.jit(lambda t, xx, fn=fn: fn(t, xx, cfg)[0])
        print(f"{name:12s} {time_fn(f, table, x):7.2f} ms")

    ref = None
    for name, fn in [("bwd_flat", bwd_flat), ("bwd_batched", bwd_batched),
                     ("bwd_hybrid", bwd_hybrid)]:
        f = jax.jit(lambda k, ww, gg, fn=fn: fn(k, ww, gg, L, T, W, F, N))
        dt = f(keys, w, gl)
        if ref is None:
            ref = dt
        else:
            err = float(jnp.abs(dt - ref).max())
            assert err < 1e-4, (name, err)
        print(f"{name:12s} {time_fn(f, keys, w, gl):7.2f} ms")
    print("DONE")


if __name__ == "__main__":
    main()
