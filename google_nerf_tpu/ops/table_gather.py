"""Trainable-table gather with a TPU-optimised backward pass.

XLA's default VJP for a gather is `scatter-add`, which on TPU executes at
~25-45M rows/s (measured, v5e) — it dominated the whole NGP train step
(~8.5s of a 9.8s step for the hash-grid gradients).  This op replaces it
with a sort-based segment reduction:

  1. sort contributions by table index            (~5ms/M rows)
  2. per-feature cumulative sums                  (~1ms/M)
  3. segment totals at run boundaries (diff of cumsum)
  4. compact the <=M boundary entries with the same sort-packing trick
  5. ONE scatter-add with unique indices          (~2x faster than general
                                                   scatter, and over far
                                                   fewer rows when indices
                                                   collide)

This is the XLA-only fast path; a Pallas sorted-tile MXU kernel is the
planned next step (ops/pallas).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def table_gather(table, idx, bwd_mode: str = "sorted"):
    """table: (M, F); idx: (N,) int32 in [0, M) -> (N, F).

    bwd_mode: 'sorted' (default) or 'scatter' (XLA native, for testing).
    """
    return jnp.take(table, idx, axis=0)


def _fwd(table, idx, bwd_mode):
    return jnp.take(table, idx, axis=0), (idx, table.shape[0])


def _segment_sum_sorted(idx, grads, m):
    """Sort-then-sorted-segment-sum: (N,) idx + (N, F) grads -> (M, F).

    Measured on v5e: a general scatter-add of 16.8M rows takes ~1.05s; this
    path (one multi-operand sort + per-feature segment_sum with
    indices_are_sorted=True) takes ~0.2-0.3s for the same reduction."""
    f = grads.shape[1]
    ops = (idx,) + tuple(grads[:, j] for j in range(f))
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    sidx = sorted_ops[0]
    cols = [jax.ops.segment_sum(v, sidx, num_segments=m,
                                indices_are_sorted=True)
            for v in sorted_ops[1:]]
    return jnp.stack(cols, -1)


def _bwd(bwd_mode, res, g):
    idx, m = res
    if bwd_mode == "scatter":
        dt = jnp.zeros((m, g.shape[-1]), g.dtype).at[idx].add(g)
    else:
        dt = _segment_sum_sorted(idx, g, m)
    return dt, None


table_gather.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Batched per-level gather — the vertex-shared hash encoder's hot op
# ---------------------------------------------------------------------------


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def batched_table_gather(table, idx, gather_dtype: str = "bfloat16"):
    """table: (L, T, F) f32; idx: (L, M) int32 in [0, T) -> (L, M, F) f32.

    The two row-traffic laws this op encodes (DESIGN_NOTES rounds 7-9,
    applied to the packed encoder first and ported here per VERDICT r1
    item 3):

      * forward: one take PER LEVEL, each from a `gather_dtype` view of
        that level — a 2^19 x 2 bf16 level is a 2 MiB working set (the
        ~200 M rows/s cache regime) where the (L*T, F) f32 concat gather
        this replaced lived in the 30-60 MiB ~40 M rows/s regime
        (tools/microbench_gather.py law; 20.1 -> 6.25 ms at packed
        flagship shapes for the same restructuring).
      * backward: levels are independent segment sums, so ONE batched
        (L, M+T) fused-single-key sort (key = cell*2 | is_marker) + masked
        cumsum + marker diff produces the dense (L, T, F) gradient with
        ZERO scatters — the same pipeline as ops/packed_hash.py:185-225,
        measured 19.0 vs 44.8 ms for the flat single-lane sort.
    """
    L = table.shape[0]
    gd = jnp.dtype(gather_dtype)
    rows = jnp.stack([jnp.take(table[l].astype(gd), idx[l], axis=0)
                      for l in range(L)])
    return rows.astype(jnp.float32)


def _bt_fwd(table, idx, gather_dtype):
    return (batched_table_gather(table, idx, gather_dtype),
            (idx, table.shape))


def _bt_bwd(gather_dtype, res, g):
    idx, (L, T, F) = res
    M = idx.shape[1]
    pos = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (L, M))
    marker_k = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (L, T))
    k_all = jnp.concatenate([idx * 2, marker_k * 2 + 1], axis=1)
    p_all = jnp.concatenate([pos, jnp.full((L, T), M, jnp.int32)], axis=1)
    ks, ps = jax.lax.sort((k_all, p_all), dimension=1, num_keys=1)
    ks = ks >> 1

    is_contrib = ps < M                                      # (L, M+T)
    safe = jnp.where(is_contrib, ps, 0)
    payload = jnp.take_along_axis(g.astype(jnp.float32), safe[..., None],
                                  axis=1)
    payload = jnp.where(is_contrib[..., None], payload, 0.0)
    csum = jnp.cumsum(payload, axis=1)                       # (L, M+T, F)

    # markers in key order: among markers, keys are unique and ascending
    stream = jnp.broadcast_to(jnp.arange(M + T, dtype=jnp.int32),
                              (L, M + T))
    mk = jnp.where(is_contrib, jnp.int32(T), ks)
    _, mrows = jax.lax.sort((mk, stream), dimension=1, num_keys=1)
    q = mrows[:, :T]                                         # (L, T)
    A = jnp.take_along_axis(csum, q[..., None], axis=1)      # (L, T, F)
    dtab = jnp.diff(A, axis=1, prepend=jnp.zeros((L, 1, F), A.dtype))
    return dtab, None


batched_table_gather.defvjp(_bt_fwd, _bt_bwd)
