"""Encoder variant shoot-out with HONEST timing: every measurement chains
iterations through a data dependency and ends with a host fetch, so the
async axon relay cannot hide (or fake) execution.  See
microbench_encoder_bwd.py for why: block_until_ready-based timings read a
1M-row gather at 0.02 ms (faster than HBM) through this tunnel.

Variants (flagship shapes N=131072, L=8, T=2^16, W=16):
  fwd_concat   one take over the (L*T, W) concat        (pre-850efa1)
  fwd_split    one take per level                       (HEAD)
  bwd_flat     flat (L*(N+T),) sort + row gathers       (pre-850efa1)
  bwd_batched  (L, N+T) batched sort + take_along_axis  (HEAD)
  bwd_hybrid   (L, N+T) batched sort + FLAT row gathers

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_encoder_bwd3.py
"""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)

from google_nerf_tpu.ops.packed_hash import (_cell_keys, _corner_weights,
                                             init_packed_hash)
from tools.microbench_encoder_bwd import (CFG, N, bwd_batched, bwd_flat,
                                          bwd_hybrid, fwd_concat, fwd_split)


def chain_time(step_fn, carry0, n=12):
    """step_fn: scalar carry -> scalar carry (jitted)."""
    c = step_fn(carry0)
    _ = float(c)                       # warm + sync
    t0 = time.perf_counter()
    c = carry0
    for _ in range(n):
        c = step_fn(c)
    _ = float(c)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    cfg = CFG
    L, T, F, W = cfg.n_levels, cfg.table_size, cfg.n_features, cfg.row_width
    table = init_packed_hash(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (N, L * F))
    gl = jnp.moveaxis(g.reshape(N, L, F), 1, 0)
    keys, frac = _cell_keys(x, cfg)
    w = _corner_weights(frac)
    keys, w, gl = jax.block_until_ready((keys, w, gl))

    # timing fidelity: bf16 4096^3 matmul = 137 GFLOP; v5e peak ~394 TFLOP/s
    # -> >= 0.35 ms/iter.  If this reads lower the harness is broken.
    a = jax.random.normal(jax.random.PRNGKey(9), (4096, 4096), jnp.bfloat16)

    @jax.jit
    def mm_step(c):
        out = (a + c.astype(jnp.bfloat16)) @ a
        return out[0, 0].astype(jnp.float32) * 0.0
    print(f"matmul4096   {chain_time(mm_step, jnp.zeros(())):7.2f} ms "
          "(floor 0.35)")

    for name, fn in [("fwd_concat", fwd_concat), ("fwd_split", fwd_split)]:
        @jax.jit
        def step(c, fn=fn):
            out, _ = fn(table + c * 0.0, x, cfg)
            return out[0, 0] * 0.0
        print(f"{name:12s} {chain_time(step, jnp.zeros(())):7.2f} ms")

    ref = None
    for name, fn in [("bwd_flat", bwd_flat), ("bwd_batched", bwd_batched),
                     ("bwd_hybrid", bwd_hybrid)]:
        @jax.jit
        def step(c, fn=fn):
            dtab = fn(keys, w, gl + c * 0.0, L, T, W, F, N)
            return dtab[0, 0, 0] * 0.0
        f = jax.jit(lambda k, ww, gg, fn=fn: fn(k, ww, gg, L, T, W, F, N))
        dt = jax.block_until_ready(f(keys, w, gl))
        if ref is None:
            ref = dt
        else:
            err = float(jnp.abs(dt - ref).max())
            assert err < 1e-4, (name, err)
        print(f"{name:12s} {chain_time(step, jnp.zeros(())):7.2f} ms")
    print("DONE")


if __name__ == "__main__":
    main()
