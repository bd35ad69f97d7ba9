"""Chip microbench: packed (per-level rows) vs packed2 (paired-level rows)
encoder forward+backward at the r4 flagship budget shape (N=57344).

The design bet (DESIGN_NOTES R5.1): the v5e gather law is row-rate bound,
so halving rows (8 -> 4 per sample, fwd AND the backward's sort lanes)
should roughly halve the ~18 ms encoder share of the 32 ms train step —
even though the paired rows are 4.4x fatter (70 vs 16 floats).

Timing law: chained dispatches ending in a host scalar fetch
(DESIGN_NOTES round 8 — block_until_ready lies through the axon relay).

Run: PYTHONPATH=/root/repo python tools/microbench_pair.py [N]
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def chain_time(step_fn, carry0, n=12):
    c = step_fn(carry0)
    _ = float(c)
    t0 = time.perf_counter()
    c = carry0
    for _ in range(n):
        c = step_fn(c)
    _ = float(c)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    from google_nerf_tpu.ops.packed_hash import (init_packed_hash,
                                                 packed_config_for_scale,
                                                 packed_hash_encode)
    from google_nerf_tpu.ops.packed_pair import (init_packed_pair,
                                                 packed_pair_config_for_scale,
                                                 packed_pair_encode)

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 57344
    tsizes = [int(t) for t in sys.argv[2:]] or [16]
    cfgA = packed_config_for_scale(0.5, n_levels=8, log2_table_size=16)
    print(f"N={N}  packed res={cfgA.resolutions}")
    tabA = init_packed_hash(jax.random.PRNGKey(0), cfgA)
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))
    g = jax.random.normal(jax.random.PRNGKey(2), (N, 16))
    x, g = jax.block_until_ready((x, g))

    variants = [("packed", packed_hash_encode, tabA, cfgA)]
    for ts in tsizes:
        cfgB = packed_pair_config_for_scale(0.5, n_pairs=4,
                                            log2_table_size=ts)
        tabB = init_packed_pair(jax.random.PRNGKey(0), cfgB)
        mb = cfgB.table_size * cfgB.row_width * 2 / 2 ** 20
        print(f"packed2_t{ts} parent res={cfgB.resolutions} "
              f"(levels {cfgB.all_resolutions}) table {mb:.1f} MiB bf16")
        variants.append((f"packed2_t{ts}", packed_pair_encode, tabB, cfgB))

    for name, enc, tab, cc in variants:
        @jax.jit
        def fwd_step(c, enc=enc, tab=tab, cc=cc):
            out = enc(tab, x + c * 0.0, cc)
            return out[0, 0] * 0.0

        @jax.jit
        def fwdbwd_step(c, enc=enc, tab=tab, cc=cc):
            def loss(t, xx):
                return jnp.sum(enc(t, xx, cc) * g)
            l, (dt, dx) = jax.value_and_grad(loss, argnums=(0, 1))(
                tab, x + c * 0.0)
            return dt[0, 0, 0] * 0.0 + dx[0, 0] * 0.0

        @jax.jit
        def fwdbwd_tab_step(c, enc=enc, tab=tab, cc=cc):
            # table-grad only (the flagship path: no pose refinement)
            def loss(t):
                return jnp.sum(enc(t, x, cc) * (g + c * 0.0))
            l, dt = jax.value_and_grad(loss)(tab)
            return dt[0, 0, 0] * 0.0

        tf = chain_time(fwd_step, jnp.zeros(()))
        tfb = chain_time(fwdbwd_step, jnp.zeros(()))
        tft = chain_time(fwdbwd_tab_step, jnp.zeros(()))
        print(f"{name:8s} fwd {tf:7.2f} ms   fwd+bwd {tfb:7.2f} ms   "
              f"fwd+bwd(tab-only) {tft:7.2f} ms")
    print("PAIR BENCH DONE")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
