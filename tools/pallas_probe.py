"""Probe Pallas TPU capabilities that decide the NGP kernel architecture:
(a) vectorized dynamic gather from a VMEM-resident table
(b) scalar-loop scatter-accumulate into a VMEM table
(c) PrefetchScalarGridSpec per-row DMA gather
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


from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, F = 1 << 16, 32          # 65k x 32 f32 = 8MB (bf16 4MB)
N = 1 << 20                 # 1M lookups

tab = jax.random.normal(key, (T, F), jnp.float32)
tabb = tab.astype(jnp.bfloat16)
idx = jax.random.randint(key, (N,), 0, T)

# (a) vector gather from VMEM
try:
    def kern(tab_ref, idx_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:], :]

    def call(t, i):
        return pl.pallas_call(
            kern,
            grid=(N // 8192,),
            out_shape=jax.ShapeDtypeStruct((N, F), t.dtype),
            in_specs=[pl.BlockSpec((T, F), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((8192,), lambda g: (g,),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8192, F), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
        )(t, i)

    out = call(tab, idx)
    ok = bool(jnp.allclose(out[:100], jnp.take(tab, idx[:100], axis=0)))

    @jax.jit
    def step(c):
        s = (c[0] * 0).astype(jnp.int32)
        g = call(tab, (idx + s) % T)
        return g.sum(0) + 0.5 * c

    dt = chain_time(step, jnp.zeros((F,)), n=5)
    print(f"(a) pallas VMEM vector gather f32 works={ok}: {dt*1e3:.2f} ms "
          f"for 1M x {F}f32 = {N/dt/1e6:.0f} M rows/s")
except Exception as e:
    print(f"(a) FAILED: {type(e).__name__}: {str(e)[:300]}")

# (a2) bf16 table
try:
    out = None

    def kernb(tab_ref, idx_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:], :]

    def callb(t, i):
        return pl.pallas_call(
            kernb,
            grid=(N // 8192,),
            out_shape=jax.ShapeDtypeStruct((N, F), jnp.bfloat16),
            in_specs=[pl.BlockSpec((T, F), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((8192,), lambda g: (g,),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8192, F), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
        )(t, i)

    out = callb(tabb, idx)
    ok = bool(jnp.allclose(out[:100].astype(jnp.float32),
                           jnp.take(tabb, idx[:100], axis=0
                                    ).astype(jnp.float32)))

    @jax.jit
    def stepb(c):
        s = (c[0] * 0).astype(jnp.int32)
        g = callb(tabb, (idx + s) % T)
        return g.astype(jnp.float32).sum(0) + 0.5 * c

    dt = chain_time(stepb, jnp.zeros((F,)), n=5)
    print(f"(a2) pallas VMEM vector gather bf16 works={ok}: {dt*1e3:.2f} ms"
          f" = {N/dt/1e6:.0f} M rows/s")
except Exception as e:
    print(f"(a2) FAILED: {type(e).__name__}: {str(e)[:300]}")

# (b) scalar-loop scatter-add into VMEM accumulator
try:
    NS = 1 << 17  # 131k contributions (one level's worth)
    vals = jax.random.normal(key, (NS, F), jnp.float32)
    sidx = jax.random.randint(key, (NS,), 0, T)

    def skern(idx_ref, vals_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            j = idx_ref[i]
            out_ref[j, :] += vals_ref[i, :]
            return 0

        jax.lax.fori_loop(0, NS, body, 0)

    def scall(i, v):
        return pl.pallas_call(
            skern,
            out_shape=jax.ShapeDtypeStruct((T, F), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(i, v)

    out = scall(sidx, vals)
    ref = jnp.zeros((T, F)).at[sidx].add(vals)
    ok = bool(jnp.allclose(out, ref, atol=1e-3))

    @jax.jit
    def steps(c):
        s = (c[0] * 0).astype(jnp.int32)
        o = scall((sidx + s) % T, vals)
        return o.sum(0) + 0.5 * c

    dt = chain_time(steps, jnp.zeros((F,)), n=3)
    print(f"(b) pallas scalar scatter-add works={ok}: {dt*1e3:.2f} ms "
          f"for 131k x {F} = {NS/dt/1e6:.1f} M rows/s")
except Exception as e:
    print(f"(b) FAILED: {type(e).__name__}: {str(e)[:300]}")

# (c) PrefetchScalarGridSpec row-DMA gather (HBM table)
try:
    NC = 1 << 14  # 16k rows via grid

    def pkern(idx_ref, tab_ref, out_ref):
        pass  # blockspec does the work

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NC,),
        in_specs=[pl.BlockSpec((1, F), lambda g, idx: (idx[g], 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, F), lambda g, idx: (g, 0),
                               memory_space=pltpu.VMEM),
    )

    def ckern(idx_ref, tab_ref, out_ref):
        out_ref[:] = tab_ref[:]

    def ccall(i, t):
        return pl.pallas_call(
            ckern,
            out_shape=jax.ShapeDtypeStruct((NC, F), jnp.float32),
            grid_spec=grid_spec,
        )(i, t)

    out = ccall(idx[:NC], tab)
    ok = bool(jnp.allclose(out, jnp.take(tab, idx[:NC], axis=0)))

    @jax.jit
    def stepc(c):
        s = (c[0] * 0).astype(jnp.int32)
        g = ccall((idx[:NC] + s) % T, tab)
        return g.sum(0) + 0.5 * c

    dt = chain_time(stepc, jnp.zeros((F,)), n=5)
    print(f"(c) pallas prefetch row-DMA works={ok}: {dt*1e3:.2f} ms "
          f"for 16k rows = {NC/dt/1e6:.1f} M rows/s")
except Exception as e:
    print(f"(c) FAILED: {type(e).__name__}: {str(e)[:300]}")
