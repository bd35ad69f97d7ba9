"""Probe: does splitting the packed-encode gather per level beat one take
over the concatenated (L*T, W) table?

The encode forward (ops/packed_hash.py:154) does ONE jnp.take over the
concatenated table with level-major keys.  The gather law (DESIGN_NOTES:
rows/s is set by working-set size: 204M rows/s <= 1 MiB, 77M at 4-16 MiB,
42M at >= 32 MiB) suggests L takes over (T, W) — each with a 2 MiB
working set at the flagship T=2^16 bf16 — could ride a faster regime than
the single 16 MiB take.  Counter-hypothesis: the level-major index
ordering already gives the same cache behavior for free.

Run on the chip: python tools/microbench_gather2.py
"""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)
key = jax.random.PRNGKey(0)


def chain_time(step_fn, carry0, n=10):
    c = step_fn(carry0)
    _ = float(jax.tree.leaves(c)[0].ravel()[0])
    t0 = time.perf_counter()
    c = carry0
    for _ in range(n):
        c = step_fn(c)
    _ = float(jax.tree.leaves(c)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    L, T, W = 8, 1 << 16, 16            # flagship packed shape
    N = 131072                           # samples budget
    table = jax.random.normal(key, (L, T, W), jnp.bfloat16)
    # level-major keys, uniform within each level (hashed-level model)
    idx = jax.random.randint(key, (L, N), 0, T)

    @jax.jit
    def one_take(table, idx):
        flat = table.reshape(L * T, W)
        keys = idx + (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
        rows = jnp.take(flat, keys.reshape(-1), axis=0)
        return rows.reshape(L, N, W).astype(jnp.float32).sum(axis=(0, 2))

    @jax.jit
    def per_level(table, idx):
        acc = jnp.zeros((N,), jnp.float32)
        for l in range(L):
            rows = jnp.take(table[l], idx[l], axis=0)
            acc = acc + rows.astype(jnp.float32).sum(axis=1)
        return acc

    @jax.jit
    def per_level_dense_aware(table, idx):
        # model the real flagship: levels 0-1 dense (res^3 rows), rest 2 MiB
        res3 = [min(r ** 3, T) for r in
                (16, 29, 52, 95, 171, 310, 561, 1016)]
        acc = jnp.zeros((N,), jnp.float32)
        for l in range(L):
            rows = jnp.take(table[l, :res3[l]], idx[l] % res3[l], axis=0)
            acc = acc + rows.astype(jnp.float32).sum(axis=1)
        return acc

    for name, fn in [("one_take(L*T=16MiB)", one_take),
                     ("per_level(2MiB each)", per_level),
                     ("per_level_dense_aware", per_level_dense_aware)]:
        # BUG FIXED (was: lambda ignored the carry and called fn(table, idx)
        # with constant inputs every iteration — the 220 M rows/s per-level
        # figure recorded from that version is untrustworthy; the honest
        # comparison lives in tools/microbench_encoder_bwd3.py)
        def step(c, fn=fn):
            tok = (c[0].ravel()[0] * 0).astype(jnp.int32)
            return fn(table, (idx + tok) % T), c[1]

        out = fn(table, idx)
        dt = chain_time(step, (out, jnp.float32(0)), n=20)
        rows = L * N
        print(f"{name:26s} {dt*1e3:7.2f} ms   "
              f"{rows/dt/1e6:6.1f} M rows/s")


if __name__ == "__main__":
    main()
