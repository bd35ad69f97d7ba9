"""Microbenchmarks of TPU primitive rates that drive the NGP kernel design.

Every benchmark reduces with a POSITION-DEPENDENT random weight so XLA
cannot fold the op away (sum(sort(x)) == sum(x) etc.).
"""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def timeit(fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    key = jax.random.PRNGKey(0)

    # ---- gather rate vs row width ----
    for rows, width, n_idx in [(8 << 20, 2, 16 << 20),
                               (8 << 20, 8, 16 << 20),
                               (1 << 19, 2, 1 << 20),
                               (1 << 19, 16, 2 << 20),
                               (1 << 19, 64, 2 << 20),
                               (1 << 16, 16, 2 << 20)]:
        table = jax.random.normal(key, (rows, width))
        idx = jax.random.randint(key, (n_idx,), 0, rows)
        w = jax.random.normal(key, (n_idx, 1))

        def f(t, i, w):
            return jnp.vdot(jnp.take(t, i, axis=0).sum(-1, keepdims=True), w)

        jf = jax.jit(f)
        dt = timeit(lambda: jf(table, idx, w))
        print(f"gather rows={rows} width={width} n={n_idx/1e6:.1f}M: "
              f"{dt*1e3:7.2f} ms = {n_idx/dt/1e6:7.1f} M rows/s")

    # ---- scatter-add ----
    for rows, width, n_idx, unique in [(8 << 20, 2, 16 << 20, False),
                                       (1 << 19, 2, 1 << 20, False),
                                       (1 << 19, 16, 1 << 20, False),
                                       (1 << 20, 2, 1 << 20, True)]:
        vals = jax.random.normal(key, (n_idx, width))
        if unique:
            idx = jax.random.permutation(key, rows)[:n_idx]
        else:
            idx = jax.random.randint(key, (n_idx,), 0, rows)
        w = jax.random.normal(key, (rows,))

        def f(i, v, w):
            out = jnp.zeros((rows, width)).at[i].add(
                v, unique_indices=unique)
            return jnp.vdot(out.sum(-1), w)

        jf = jax.jit(f)
        dt = timeit(lambda: jf(idx, vals, w), n=5)
        print(f"scatter rows={rows} width={width} n={n_idx/1e6:.1f}M "
              f"unique={unique}: {dt*1e3:7.2f} ms = "
              f"{n_idx/dt/1e6:7.1f} M rows/s")

    # ---- sort ----
    for n, ops in [(1 << 20, 2), (1 << 20, 3), (16 << 20, 2), (16 << 20, 3)]:
        k = jax.random.randint(key, (n,), 0, 1 << 19)
        payload = [jax.random.normal(key, (n,)) for _ in range(ops - 1)]
        w = jax.random.normal(key, (n,))

        def f(w, k, *p):
            s = jax.lax.sort((k,) + p, num_keys=1)
            return jnp.vdot(s[0].astype(jnp.float32), w) + sum(
                jnp.vdot(x, w) for x in s[1:])

        jf = jax.jit(f)
        dt = timeit(lambda: jf(w, k, *payload), n=5)
        print(f"sort n={n/1e6:.1f}M ops={ops}: {dt*1e3:7.2f} ms = "
              f"{n/dt/1e6:7.1f} M rows/s")

    # ---- segment_sum over sorted ids ----
    n, m = 16 << 20, 8 << 20
    k = jnp.sort(jax.random.randint(key, (n,), 0, m))
    v = jax.random.normal(key, (n,))
    w = jax.random.normal(key, (m,))
    jf = jax.jit(lambda k, v, w: jnp.vdot(jax.ops.segment_sum(
        v, k, num_segments=m, indices_are_sorted=True), w))
    dt = timeit(lambda: jf(k, v, w), n=5)
    print(f"segment_sum(sorted) n=16.8M -> 8.4M: {dt*1e3:7.2f} ms")

    # ---- first-K selection: top_k vs searchsorted ----
    R, N, K = 8192, 1024, 128
    mask = jax.random.bernoulli(key, 0.1, (R, N))
    wv = jax.random.normal(key, (R, K))

    def via_topk(m, wv):
        iota = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
        score = jnp.where(m, -iota, -(N + 1))
        vals, idx = jax.lax.top_k(score, K)
        return jnp.vdot(idx.astype(jnp.float32), wv)

    def via_search(m, wv):
        cs = jnp.cumsum(m.astype(jnp.int32), axis=1)
        tgt = jnp.arange(1, K + 1)
        idx = jax.vmap(lambda row: jnp.searchsorted(row, tgt))(cs)
        return jnp.vdot(idx.astype(jnp.float32), wv)

    for name, f in [("top_k", via_topk), ("searchsorted", via_search)]:
        jf = jax.jit(f)
        dt = timeit(lambda jf=jf: jf(mask, wv), n=10)
        print(f"first-K {name}: {dt*1e3:7.2f} ms")

    # ---- the actual hash fwd decomposed: gather vs index math vs einsum ---
    NB, L, F, T = 131072, 16, 2, 1 << 19
    flat_table = jax.random.normal(key, (L * T, F))
    all_idx = jax.random.randint(key, (8 * L * NB,), 0, L * T)
    wq = jax.random.normal(key, (8, L, NB, F))

    def hash_gather_einsum(tab, idx, wq):
        feats = jnp.take(tab, idx, axis=0).reshape(8, L, NB, F)
        return jnp.vdot(feats, wq)

    jf = jax.jit(hash_gather_einsum)
    dt = timeit(lambda: jf(flat_table, all_idx, wq), n=10)
    print(f"hash-like gather 16.8M + weighted sum: {dt*1e3:7.2f} ms")

    w8 = jax.random.normal(key, (8, L, NB))

    def hash_gather_contract(tab, idx, w8):
        feats = jnp.take(tab, idx, axis=0).reshape(8, L, NB, F)
        out = jnp.einsum("cln,clnf->lnf", w8, feats)  # as in hash_encode
        out = jnp.moveaxis(out, 0, 1).reshape(NB, L * F)
        return out.sum()

    jf = jax.jit(hash_gather_contract)
    dt = timeit(lambda: jf(flat_table, all_idx, w8), n=10)
    print(f"hash fwd shape (gather+einsum+moveaxis): {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
