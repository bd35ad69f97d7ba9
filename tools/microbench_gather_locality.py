"""Does index LOCALITY change XLA gather speed on v5e?

The serving cost model (DESIGN_NOTES, PARITY) assumes the fat-row gather
law `cost ~= a + b*row_bytes` measured with RANDOM indices at >=32 MiB
working sets.  The brick renderer orders samples tile-contiguously, so
its index stream is mostly SORTED with heavy short-range reuse — if the
gather engine rides cache/HBM-burst locality, the law's constants are
pessimistic and the brick renderer has headroom; if rates match random,
serving truly is row-count bound and only fewer/narrower rows help.

Variants (32 MiB bf16 table, 1M rows of 64 B):
  random      uniform indices
  sorted      same multiset of indices, ascending
  blocked     sorted within 8k-row pages, pages visited in random order
              (what tile-contiguous brick order actually produces)
  dup8        each index repeated 8x consecutively (corner reuse regime)

Timing: chained carry + host scalar fetch (the only honest pattern
through the axon relay — tools/microbench_encoder_bwd3.py), with the
4096^3 matmul fidelity floor.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_gather_locality.py
"""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)

T = 1 << 19          # 512k rows
W = 32               # x bf16 = 64 B/row -> 32 MiB table (slow regime)
N = 1 << 20          # 1M lookups


def chain_time(step_fn, n=12):
    c = jnp.zeros(())
    c = step_fn(c)
    _ = float(c)
    t0 = time.perf_counter()
    c = jnp.zeros(())
    for _ in range(n):
        c = step_fn(c)
    _ = float(c)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (T, W), jnp.bfloat16)

    rnd = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T,
                             dtype=jnp.int32)
    srt = jnp.sort(rnd)
    # blocked: sort within 8k pages, then permute the pages
    pages = srt.reshape(N // 8192, 8192)
    perm = jax.random.permutation(jax.random.PRNGKey(2), N // 8192)
    blocked = pages[perm].reshape(-1)
    dup8 = jnp.repeat(rnd[: N // 8], 8)

    a = jax.random.normal(jax.random.PRNGKey(9), (4096, 4096), jnp.bfloat16)

    @jax.jit
    def mm_step(c):
        out = (a + c.astype(jnp.bfloat16)) @ a
        return out[0, 0].astype(jnp.float32) * 0.0

    print(f"matmul4096   {chain_time(mm_step):7.2f} ms (floor 0.35)")

    for name, idx in [("random", rnd), ("sorted", srt),
                      ("blocked8k", blocked), ("dup8", dup8)]:
        idx = jax.block_until_ready(idx)

        @jax.jit
        def step(c, idx=idx):
            tok = (c * 0.0).astype(jnp.int32)
            rows = jnp.take(table, idx + tok, axis=0)
            return rows[0, 0].astype(jnp.float32) * 0.0

        dt = chain_time(step)
        print(f"{name:12s} {dt:7.2f} ms   {N/dt/1e3:7.1f} M rows/s   "
              f"{N*W*2/dt/1e6:6.1f} GB/s")
    print("DONE")


if __name__ == "__main__":
    main()
