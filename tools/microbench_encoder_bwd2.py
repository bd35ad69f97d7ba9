"""Variant shoot-out with VARIED inputs per iteration (defeats any
same-input execution caching in the remote relay) + a known-FLOPs matmul
to validate timing fidelity.  See microbench_encoder_bwd.py for the
variant definitions (imported from there)."""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)

from google_nerf_tpu.ops.packed_hash import (_cell_keys, _corner_weights,
                                             init_packed_hash)
from tools.microbench_encoder_bwd import (CFG, N, bwd_batched, bwd_flat,
                                          bwd_hybrid, fwd_concat, fwd_split)


def time_fn(fn, arg_sets, iters=24):
    outs = [fn(*a) for a in arg_sets]          # compile + warm every shape
    jax.block_until_ready(outs)
    t0 = time.time()
    for i in range(iters):
        out = fn(*arg_sets[i % len(arg_sets)])
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def main():
    cfg = CFG
    L, T, F, W = cfg.n_levels, cfg.table_size, cfg.n_features, cfg.row_width
    table = init_packed_hash(jax.random.PRNGKey(0), cfg)

    # timing fidelity: bf16 4096^3 matmul = 137 GFLOP; v5e peak 394 TFLOP/s
    # -> >=0.35 ms.  If this reads <0.3 ms the relay timing is broken.
    a = jax.random.normal(jax.random.PRNGKey(9), (4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda u, v: u @ v)
    print(f"matmul4096   {time_fn(mm, [(a, a)]):7.2f} ms (floor 0.35)")

    xs = [jax.random.uniform(jax.random.PRNGKey(10 + i), (N, 3))
          for i in range(4)]
    gs = [jax.random.normal(jax.random.PRNGKey(20 + i), (N, L * F))
          for i in range(4)]
    kw = [jax.block_until_ready(
        (lambda k_f: (k_f[0], _corner_weights(k_f[1])))(_cell_keys(x, cfg)))
        for x in xs]
    gls = [jnp.moveaxis(g.reshape(N, L, F), 1, 0) for g in gs]

    for name, fn in [("fwd_concat", fwd_concat), ("fwd_split", fwd_split)]:
        f = jax.jit(lambda t, xx, fn=fn: fn(t, xx, cfg)[0])
        print(f"{name:12s} {time_fn(f, [(table, x) for x in xs]):7.2f} ms")

    for name, fn in [("bwd_flat", bwd_flat), ("bwd_batched", bwd_batched),
                     ("bwd_hybrid", bwd_hybrid)]:
        f = jax.jit(lambda k, ww, gg, fn=fn: fn(k, ww, gg, L, T, W, F, N))
        args = [(k, w, gl) for (k, w), gl in zip(kw, gls)]
        print(f"{name:12s} {time_fn(f, args):7.2f} ms")
    print("DONE")


if __name__ == "__main__":
    main()
