"""Gather-rate characterization on the real chip.

The whole framework is gather-bound (DESIGN_NOTES v5e table), but the
measured encoder gather floor (1.05M rows from (512k,16) f32 in ~25 ms =
42M rows/s) is far below the ~130-160M rows/s seen in earlier
calibrations.  This probe maps the rate surface so the encoder layout and
the baked-brick serving renderer are designed against measured numbers:

  A. rate vs table row count (fixed 64B rows, 1.05M gathers)
  B. rate vs row width 32B..4KB (fixed 65536-row table, 262k gathers)
  C. split-per-level (8 x 131k from (65536,16)) vs merged (1 x 1.05M
     from (524288,16)) — does a smaller working set help?
  D. dtype: f32 / bf16 / fp8 rows at the flagship encoder shape
  E. index locality: random vs sorted vs block-local indices
"""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)
key = jax.random.PRNGKey(0)


def chain_time(step_fn, carry0, n=10):
    fn = jax.jit(step_fn)
    c = fn(carry0)
    _ = float(jax.tree.leaves(c)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        c = fn(c)
    _ = float(jax.tree.leaves(c)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


def rate(name, n_rows, row_bytes, fn, carry0, n=10):
    dt = chain_time(fn, carry0, n=n)
    print(f"{name:44s} {dt*1e3:8.2f} ms  {n_rows/dt/1e6:7.1f} M rows/s  "
          f"{n_rows*row_bytes/dt/2**30:7.1f} GiB/s")
    return dt


def gather_probe(table, idx):
    def step(c):
        rows = jnp.take(table, (idx + c[0]) % table.shape[0], axis=0)
        return (c[0] * 0 + rows.ravel()[0].astype(jnp.int32) * 0,
                rows.sum(0, dtype=jnp.float32)
                if rows.dtype != jnp.int32 else rows.sum(0))
    return step


def main():
    N = 1 << 20                     # 1.05M gather rows (flagship encoder)

    print("== A: rate vs table rows (16 x f32 = 64B rows, 1.05M gathers)")
    for logT in (12, 14, 16, 18, 19, 20, 22):
        T = 1 << logT
        table = jax.random.normal(key, (T, 16), jnp.float32)
        idx = jax.random.randint(key, (N,), 0, T)
        rate(f"T=2^{logT} ({T*64/2**20:.1f} MiB table)", N, 64,
             gather_probe(table, idx), (jnp.int32(0), jnp.zeros(16)))

    print("== B: rate vs row width (65536-row table, 262k gathers)")
    Nb = 1 << 18
    for W in (8, 16, 32, 64, 128, 256, 512, 1024):
        table = jax.random.normal(key, (65536, W), jnp.float32)
        idx = jax.random.randint(key, (Nb,), 0, 65536)
        rate(f"width={W*4}B", Nb, W * 4, gather_probe(table, idx),
             (jnp.int32(0), jnp.zeros(W)))

    print("== C: split-per-level vs merged (flagship encoder shape)")
    Tm = jax.random.normal(key, (8, 65536, 16), jnp.float32)
    idx8 = jax.random.randint(key, (8, N // 8), 0, 65536)

    def split(c):
        acc = jnp.zeros(16)
        tok = c[0] * 0
        for l in range(8):
            rows = jnp.take(Tm[l], (idx8[l] + c[0]) % 65536, axis=0)
            acc = acc + rows.sum(0, dtype=jnp.float32)
        return (tok, acc)

    rate("8 x 131k from (65536,16)", N, 64, split,
         (jnp.int32(0), jnp.zeros(16)))
    T2 = Tm.reshape(-1, 16)
    idxm = (idx8 + (jnp.arange(8)[:, None] << 16)).ravel()
    rate("1 x 1.05M from (524288,16)", N, 64, gather_probe(T2, idxm),
         (jnp.int32(0), jnp.zeros(16)))

    print("== D: dtype at flagship shape (1.05M from 524288 rows)")
    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16),
                        ("fp8", jnp.float8_e4m3fn)):
        tb = T2.astype(dt)
        w = 16 * tb.dtype.itemsize
        rate(f"{dt_name} rows ({w}B)", N, w, gather_probe(tb, idxm),
             (jnp.int32(0), jnp.zeros(16)))

    print("== E: index locality (524288x16 f32, 1.05M gathers)")
    idx_r = jax.random.randint(key, (N,), 0, 1 << 19)
    rate("random", N, 64, gather_probe(T2, idx_r),
         (jnp.int32(0), jnp.zeros(16)))
    idx_s = jnp.sort(idx_r)
    rate("sorted", N, 64, gather_probe(T2, idx_s),
         (jnp.int32(0), jnp.zeros(16)))
    base = jax.random.randint(key, (N // 64,), 0, (1 << 19) - 64)
    idx_b = (base[:, None] + jnp.arange(64)[None]).ravel()
    rate("block-local (64-runs)", N, 64, gather_probe(T2, idx_b),
         (jnp.int32(0), jnp.zeros(16)))
    print("DONE")


if __name__ == "__main__":
    main()
