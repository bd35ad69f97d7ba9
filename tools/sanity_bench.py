"""Honest TPU timing through the axon tunnel: every benchmark CHAINS n
iterations through a data dependency and ends with a host fetch (float()),
so async dispatch cannot hide execution.  RTT measured and subtracted.
"""
import time, functools
import jax, jax.numpy as jnp
import numpy as np
print = functools.partial(print, flush=True)
key = jax.random.PRNGKey(0)


def chain_time(step_fn, carry0, n=20):
    """step_fn: carry -> carry (jitted). Returns seconds/iter."""
    c = step_fn(carry0)
    _ = float(jax.tree.leaves(c)[0].ravel()[0])  # warm + sync
    t0 = time.perf_counter()
    c = carry0
    for _ in range(n):
        c = step_fn(c)
    _ = float(jax.tree.leaves(c)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


# RTT floor
trivial = jax.jit(lambda c: c + 1.0)
rtt = chain_time(trivial, jnp.zeros(()), n=50)
print(f"chained trivial op (dispatch+RTT amortized): {rtt*1e6:.0f} us")

# matmul floor
a = jax.random.normal(key, (8192, 8192), jnp.bfloat16)


@jax.jit
def mm_step(c):
    return jnp.dot(a + c[0, 0], a, preferred_element_type=jnp.bfloat16)


dt = chain_time(mm_step, jnp.zeros((8192, 8192), jnp.bfloat16), n=10)
print(f"matmul 8192^3 bf16: {dt*1e3:.2f} ms = {2*8192**3/dt/1e12:.1f} TFLOP/s")

# elementwise HBM floor
x0 = jax.random.normal(key, (128 << 20,))
ew = jax.jit(lambda c: c * 1.0000001)
dt = chain_time(ew, x0, n=10)
print(f"elementwise 512MB: {dt*1e3:.2f} ms = {2*0.5/dt:.0f} GB/s")

# gather: chain by shifting indices with a value derived from prev output
table = jax.random.normal(key, (8 << 20, 2))
idx0 = jax.random.randint(key, (16 << 20,), 0, 8 << 20)


@jax.jit
def gather_step(c):
    s = (c[0] * 0).astype(jnp.int32)  # dependency, value 0
    g = jnp.take(table, idx0 + s, axis=0)
    return g.sum(0) + c * 0.5


dt = chain_time(gather_step, jnp.zeros((2,)), n=10)
print(f"gather 16.8M rows w=2 (+colsum): {dt*1e3:.2f} ms = "
      f"{16.8/dt/1e3:.2f} G rows/s")

# gather wide rows
tw = jax.random.normal(key, (1 << 19, 64))
idxw = jax.random.randint(key, (2 << 20,), 0, 1 << 19)


@jax.jit
def gatherw_step(c):
    s = (c[0] * 0).astype(jnp.int32)
    g = jnp.take(tw, idxw + s, axis=0)
    return g.sum(0) + c * 0.5


dt = chain_time(gatherw_step, jnp.zeros((64,)), n=10)
print(f"gather 2.1M rows w=64 (+colsum): {dt*1e3:.2f} ms")

# sort 16.8M 3-operand
k32 = jax.random.randint(key, (16 << 20,), 0, 1 << 19)
p1 = jax.random.normal(key, (16 << 20,))
p2 = jax.random.normal(key, (16 << 20,))


@jax.jit
def sort_step(c):
    s = (c * 0).astype(jnp.int32)
    out = jax.lax.sort((k32 + s, p1, p2), num_keys=1)
    return out[1][0] + c * 0.5


dt = chain_time(sort_step, jnp.zeros(()), n=5)
print(f"sort 16.8M 3-op: {dt*1e3:.2f} ms")

k1m = k32[:1 << 20]


@jax.jit
def sort1_step(c):
    s = (c * 0).astype(jnp.int32)
    out = jax.lax.sort((k1m + s, p1[:1 << 20], p2[:1 << 20]), num_keys=1)
    return out[1][0] + c * 0.5


dt = chain_time(sort1_step, jnp.zeros(()), n=5)
print(f"sort 1M 3-op: {dt*1e3:.2f} ms")

# scatter-add duplicates 16.8M -> 8.4M x 2
vals = jax.random.normal(key, (16 << 20, 2))


@jax.jit
def scat_step(c):
    s = (c[0] * 0).astype(jnp.int32)
    out = jnp.zeros((8 << 20, 2)).at[idx0 + s].add(vals)
    return out.sum(0) + c * 0.5


dt = chain_time(scat_step, jnp.zeros((2,)), n=3)
print(f"scatter-add 16.8M dup: {dt*1e3:.2f} ms")

# scatter-add 1M -> 512k
idx1m = jax.random.randint(key, (1 << 20,), 0, 1 << 19)
vals1m = jax.random.normal(key, (1 << 20, 2))


@jax.jit
def scat1_step(c):
    s = (c[0] * 0).astype(jnp.int32)
    out = jnp.zeros((1 << 19, 2)).at[idx1m + s].add(vals1m)
    return out.sum(0) + c * 0.5


dt = chain_time(scat1_step, jnp.zeros((2,)), n=3)
print(f"scatter-add 1M->512k dup: {dt*1e3:.2f} ms")

# segment-sum over sorted ids 16.8M -> 8.4M
ksort = jnp.sort(idx0)


@jax.jit
def seg_step(c):
    s = (c[0] * 0).astype(jnp.int32)
    out = jax.ops.segment_sum(vals, ksort + s, num_segments=8 << 20,
                              indices_are_sorted=True)
    return out.sum(0) + c * 0.5


dt = chain_time(seg_step, jnp.zeros((2,)), n=3)
print(f"segment_sum sorted 16.8M: {dt*1e3:.2f} ms")

# top_k vs searchsorted for first-K
R, N, K = 8192, 1024, 128
mask0 = jax.random.bernoulli(key, 0.1, (R, N))


@jax.jit
def topk_step(c):
    m = mask0 ^ (c[0] > 1e9)
    iota = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    score = jnp.where(m, -iota, -(N + 1))
    vals, idx = jax.lax.top_k(score, K)
    return idx.astype(jnp.float32).sum(0) + c * 0.5


dt = chain_time(topk_step, jnp.zeros((K,)), n=10)
print(f"first-K top_k (8192x1024->128): {dt*1e3:.2f} ms")


@jax.jit
def ss_step(c):
    m = mask0 ^ (c[0] > 1e9)
    cs = jnp.cumsum(m.astype(jnp.int32), axis=1)
    tgt = jnp.arange(1, K + 1)
    idx = jax.vmap(lambda row: jnp.searchsorted(row, tgt))(cs)
    return idx.astype(jnp.float32).sum(0) + c * 0.5


dt = chain_time(ss_step, jnp.zeros((K,)), n=10)
print(f"first-K searchsorted: {dt*1e3:.2f} ms")
