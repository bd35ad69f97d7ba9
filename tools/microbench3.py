"""Round-3 microbenchmarks: the specific rates the NGP redesign needs.
Chained timing (see sanity_bench.py) — async dispatch cannot hide work.
"""
import time, functools
import jax, jax.numpy as jnp
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


# (a) unique-indices scatter: 1M rows x 32 f32 into 2.1M-row table
N, W, T = 1 << 20, 32, 1 << 21
perm = jax.random.permutation(key, T)[:N]
vals = jax.random.normal(key, (N, W))


@jax.jit
def scat_u(c):
    s = (c[0] * 0).astype(jnp.int32)
    out = jnp.zeros((T, W)).at[perm + s].add(vals, unique_indices=True)
    return out.sum(0) + 0.5 * c


dt = chain_time(scat_u, jnp.zeros((W,)), n=5)
print(f"unique-scatter 1M x 32f32 -> 2.1M: {dt*1e3:.2f} ms")


# (a2) unique-indices SET (no add)
@jax.jit
def scat_s(c):
    s = (c[0] * 0).astype(jnp.int32)
    out = jnp.zeros((T, W)).at[perm + s].set(vals, unique_indices=True)
    return out.sum(0) + 0.5 * c


dt = chain_time(scat_s, jnp.zeros((W,)), n=5)
print(f"unique-set 1M x 32f32 -> 2.1M: {dt*1e3:.2f} ms")

# (b) gather 1M x 32 f32 rows from 65k / 512k tables
for TT in (1 << 16, 1 << 19):
    tab = jax.random.normal(key, (TT, W))
    idx = jax.random.randint(key, (N,), 0, TT)

    @jax.jit
    def gath(c, tab=tab, idx=idx, TT=TT):
        s = (c[0] * 0).astype(jnp.int32)
        g = jnp.take(tab, (idx + s) % TT, axis=0)
        return g.sum(0) + 0.5 * c

    dt = chain_time(gath, jnp.zeros((W,)), n=5)
    print(f"gather 1M x 32f32 from {TT}: {dt*1e3:.2f} ms")

# (b2) gather 1M x 32 BF16 rows
tabb = jax.random.normal(key, (1 << 16, W), jnp.bfloat16)
idx = jax.random.randint(key, (N,), 0, 1 << 16)


@jax.jit
def gathb(c):
    s = (c[0] * 0).astype(jnp.int32)
    g = jnp.take(tabb, (idx + s) % (1 << 16), axis=0)
    return g.astype(jnp.float32).sum(0) + 0.5 * c


dt = chain_time(gathb, jnp.zeros((W,)), n=5)
print(f"gather 1M x 32bf16 from 65k: {dt*1e3:.2f} ms")

# (c) scan-DDA cost model: 96 sequential steps, each gathers 8192 bytes
occ = jax.random.randint(key, (1 << 21,), 0, 255, dtype=jnp.int32)
R = 8192


@jax.jit
def dda(c):
    def body(carry, _):
        pos = carry
        cell = (pos * 1000003) % (1 << 21)
        d = jnp.take(occ, cell, axis=0)
        return pos + d + 1, None

    pos, _ = jax.lax.scan(body, c.astype(jnp.int32), None, length=96)
    return pos.astype(jnp.float32) * 1e-9


dt = chain_time(dda, jnp.zeros((R,)), n=5)
print(f"scan 96 steps x 8192 gathers: {dt*1e3:.2f} ms")

# (d) cumsum 1M x 32
x = jax.random.normal(key, (1 << 20, W))


@jax.jit
def cs(c):
    y = jnp.cumsum(x + c[0] * 0, axis=0)
    return y[-1] + 0.5 * c


dt = chain_time(cs, jnp.zeros((W,)), n=5)
print(f"cumsum 1M x 32 f32: {dt*1e3:.2f} ms")

# (e) sort 1M (key int32, pos int32) 2-op
k1m = jax.random.randint(key, (1 << 20,), 0, 1 << 19)
pos = jnp.arange(1 << 20, dtype=jnp.int32)


@jax.jit
def srt(c):
    s = (c * 0).astype(jnp.int32)
    a, b = jax.lax.sort((k1m + s, pos), num_keys=1)
    return b[0].astype(jnp.float32) + 0.5 * c


dt = chain_time(srt, jnp.zeros(()), n=5)
print(f"sort 1M 2-op int32: {dt*1e3:.2f} ms")

# (f) full proposed bwd pipeline: sort keys+pos, gather payload, cumsum,
#     boundary diff, unique-ish scatter (use set on sorted-unique)
payload = jax.random.normal(key, (1 << 20, W))


@jax.jit
def bwd_pipe(c):
    s = (c[0] * 0).astype(jnp.int32)
    kk, pp = jax.lax.sort((k1m + s, pos), num_keys=1)
    pv = jnp.take(payload, pp, axis=0)
    csum = jnp.cumsum(pv, axis=0)
    last = jnp.concatenate([kk[1:] != kk[:-1],
                            jnp.ones((1,), bool)])
    # boundary totals: csum at last minus csum at previous boundary
    total = jnp.where(last[:, None],
                      csum - jnp.concatenate(
                          [jnp.zeros((1, W)),
                           jnp.where(last[:-1, None], csum[:-1], 0)]), 0.0)
    # ^ not exactly right math, but same op mix/cost
    out = jnp.zeros(((1 << 19), W)).at[jnp.where(last, kk, 1 << 19 - 1)
                                       ].add(total, mode="drop")
    return out.sum(0) + 0.5 * c


dt = chain_time(bwd_pipe, jnp.zeros((W,)), n=5)
print(f"full bwd pipeline 1M x 32 (sort+gather+cumsum+scatter): "
      f"{dt*1e3:.2f} ms")
