"""Round-3 dtable segment-sum shoot-out: can we beat the two-sort bwd?

The encoder backward's dtable is a segment-sum of N random-key rows into
a (T, W) table, per level.  HEAD does it with TWO (L, N+T) sorts
(contrib+marker sort, then a marker-extraction sort).  Variants here:

  cur      HEAD: (L, N+T) fused-key sort + second (L, N+T) marker sort
  bis      sort1 as HEAD; replace sort2 with branchless bisect on
           cumsum(is_marker) (queries are arange(T); 18 take_along_axis
           rounds of (L, T) from (L, N+T))
  con      sort CONTRIBS ONLY (L, N) (no marker rows), csum payload,
           then r[t] = #keys<=t via bisect on the sorted keys; dtab =
           diff of csum at r — one smaller sort + bisect, no markers
  con16    con with a bf16 payload gather (csum still f32)

Each variant is timed at flagship (N=131072) and b32k (N=524288)
budget shapes; correctness is asserted against a per-level one-hot
einsum reference at toy shapes first (run on CPU: JAX_PLATFORMS=cpu).

Timing law: chained carry + host scalar fetch (DESIGN_NOTES round 8).
"""
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def _bisect_counts(sorted_vals, targets):
    """sorted_vals: (L, M) nondecreasing; targets: (Q,) ascending.

    Returns (L, Q) r with r[l, q] = #(sorted_vals[l] < targets[q])
    (i.e. searchsorted side='left'), via branchless binary search:
    ceil(log2(M+1)) rounds of (L, Q) take_along_axis."""
    L, M = sorted_vals.shape
    Q = targets.shape[0]
    lo = jnp.zeros((L, Q), jnp.int32)
    hi = jnp.full((L, Q), M, jnp.int32)
    t = targets[None, :]
    n_rounds = max(1, (M + 1).bit_length())
    for _ in range(n_rounds):
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(sorted_vals, jnp.minimum(mid, M - 1), axis=1)
        go_right = (v < t) & (mid < M)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def dtab_cur(keys, payload_src, T):
    """HEAD algorithm (packed_hash._bwd dtable half)."""
    L, n = keys.shape
    W = payload_src.shape[-1]
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (L, n))
    marker_k = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (L, T))
    k_all = jnp.concatenate([keys * 2, marker_k * 2 + 1], axis=1)
    p_all = jnp.concatenate([pos, jnp.full((L, T), n, jnp.int32)], axis=1)
    ks, ps = jax.lax.sort((k_all, p_all), dimension=1, num_keys=1)
    ks = ks >> 1
    is_contrib = ps < n
    safe = jnp.where(is_contrib, ps, 0)
    payload = jnp.take_along_axis(payload_src, safe[..., None], axis=1)
    payload = jnp.where(is_contrib[..., None], payload, 0.0)
    csum = jnp.cumsum(payload, axis=1)
    stream = jnp.broadcast_to(jnp.arange(n + T, dtype=jnp.int32), (L, n + T))
    mk = jnp.where(is_contrib, jnp.int32(T), ks)
    _, mrows = jax.lax.sort((mk, stream), dimension=1, num_keys=1)
    q = mrows[:, :T]
    A = jnp.take_along_axis(csum, q[..., None], axis=1)
    return jnp.diff(A, axis=1, prepend=jnp.zeros((L, 1, W), A.dtype))


def dtab_bis(keys, payload_src, T):
    """sort1 as HEAD; marker positions via bisect on cumsum(is_marker)."""
    L, n = keys.shape
    W = payload_src.shape[-1]
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (L, n))
    marker_k = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (L, T))
    k_all = jnp.concatenate([keys * 2, marker_k * 2 + 1], axis=1)
    p_all = jnp.concatenate([pos, jnp.full((L, T), n, jnp.int32)], axis=1)
    _, ps = jax.lax.sort((k_all, p_all), dimension=1, num_keys=1)
    is_contrib = ps < n
    safe = jnp.where(is_contrib, ps, 0)
    payload = jnp.take_along_axis(payload_src, safe[..., None], axis=1)
    payload = jnp.where(is_contrib[..., None], payload, 0.0)
    csum = jnp.cumsum(payload, axis=1)
    nm = jnp.cumsum((~is_contrib).astype(jnp.int32), axis=1)  # (L, n+T)
    # q[l, t] = first p with nm[l, p] == t+1  (marker t's stream position)
    q = _bisect_counts(nm, jnp.arange(1, T + 1, dtype=jnp.int32))
    A = jnp.take_along_axis(csum, q[..., None], axis=1)
    return jnp.diff(A, axis=1, prepend=jnp.zeros((L, 1, W), A.dtype))


def dtab_con(keys, payload_src, T, payload_dtype=jnp.float32):
    """Contrib-only sort + csum + bisect on the sorted keys themselves."""
    L, n = keys.shape
    W = payload_src.shape[-1]
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (L, n))
    ks, ps = jax.lax.sort((keys, pos), dimension=1, num_keys=1)
    payload = jnp.take_along_axis(
        payload_src.astype(payload_dtype), ps[..., None], axis=1)
    csum = jnp.cumsum(payload.astype(jnp.float32), axis=1)   # (L, n, W)
    # r[l, t] = #(keys <= t) = searchsorted(ks, t+1, 'left')
    r = _bisect_counts(ks, jnp.arange(1, T + 1, dtype=jnp.int32))  # (L,T)
    csum0 = jnp.concatenate(
        [jnp.zeros((L, 1, W), csum.dtype), csum], axis=1)    # (L, n+1, W)
    A = jnp.take_along_axis(csum0, r[..., None], axis=1)     # (L, T, W)
    return jnp.diff(A, axis=1, prepend=jnp.zeros((L, 1, W), A.dtype))


VARIANTS = {
    "cur": dtab_cur,
    "bis": dtab_bis,
    "con": dtab_con,
    "con16": functools.partial(dtab_con, payload_dtype=jnp.bfloat16),
}


def check_correctness():
    L, n, T, W = 3, 257, 64, 4
    k = jax.random.randint(jax.random.PRNGKey(0), (L, n), 0, T, jnp.int32)
    p = jax.random.normal(jax.random.PRNGKey(1), (L, n, W))
    want = jnp.einsum("lnt,lnw->ltw",
                      jax.nn.one_hot(k, T, dtype=p.dtype), p)
    for name, fn in VARIANTS.items():
        got = fn(k, p, T)
        err = float(jnp.max(jnp.abs(got - want)))
        tol = 5e-2 if name == "con16" else 1e-4
        status = "ok" if err < tol else "FAIL"
        print(f"correctness {name}: max|err|={err:.2e} {status}")
        assert err < tol, name


def chain_time(fn, keys, payload_src, T, n_iter=8):
    jfn = jax.jit(lambda c: fn(keys, payload_src + c, T)[0, 0, 0] * 0.0)
    c = jfn(jnp.float32(0.0))
    _ = float(c)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        c = jfn(c)
    _ = float(c)
    return (time.perf_counter() - t0) / n_iter * 1e3


def main():
    if jax.devices()[0].platform == "cpu":
        # the one-hot einsum reference runs at bf16 matmul precision on
        # TPU — correctness is a CPU-only check
        check_correctness()
        print("CPU correctness only; rerun on chip for timings")
        return
    L, T, W = 8, 1 << 16, 16
    for n in (131072, 524288):
        keys = jax.random.randint(
            jax.random.PRNGKey(0), (L, n), 0, T, jnp.int32)
        payload = jax.random.normal(jax.random.PRNGKey(1), (L, n, W))
        keys, payload = jax.block_until_ready((keys, payload))
        for name, fn in VARIANTS.items():
            ms = chain_time(fn, keys, payload, T)
            print(f"N={n} {name}: {ms:.2f} ms")
    print("DONE")


if __name__ == "__main__":
    import sys
    if "--cpu" in sys.argv:
        # the axon plugin overrides JAX_PLATFORMS; only the config flag
        # actually forces CPU (verify-skill gotcha)
        jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "/root/repo")
    main()
