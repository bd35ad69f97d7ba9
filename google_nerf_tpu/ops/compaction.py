"""Global sample compaction: pack valid (ray, sample) slots into a fixed
budget before running the field network.

The reference gets "only evaluate real samples" for free from its CUDA CSR
stream (variable shapes, host sync).  The TPU-native equivalent keeps static
shapes: sort the flat validity mask once (~5-10 ms for 1M slots), evaluate
the MLP/encoder on the first `budget` valid samples only, and scatter-free
unpack results back to the padded (R, K) grid.

Both pack and unpack use custom VJPs so that FORWARD AND BACKWARD are pure
gathers (the mapping between valid slots and budget slots is a bijection, so
the transpose of each gather is another gather via the inverse index) — no
XLA scatter anywhere, which is the slow path on TPU (~25-50M rows/s vs
~160M rows/s for gather; measured on v5e).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PackPlan(NamedTuple):
    src_idx: jnp.ndarray    # (B,) flat source index for each budget slot
    pos: jnp.ndarray        # (N,) budget slot for each flat source (or >=B)
    keep: jnp.ndarray       # (N,) bool: valid and within budget
    slot_valid: jnp.ndarray  # (B,) bool: slot holds a real sample
    n_valid: jnp.ndarray    # () total valid samples (pre-budget)


def plan_packing(valid: jnp.ndarray, budget: int,
                 sample_major: bool = True) -> PackPlan:
    """valid: (R, K) bool -> packing plan for budget B.

    sample_major (default): budget slots are filled in sample-slot-major
    order (all rays' sample 0, then sample 1, ...), so when the budget
    truncates, every ray keeps its NEAR samples and only far tails drop —
    matching the reference marcher's per-ray truncation semantics
    (`custom_functions.py:92-97`).  Ray-major filling (False) would starve
    whole trailing rays, which poisons their pixels' gradients toward the
    background.
    """
    R, K = valid.shape
    flat = valid.reshape(-1)
    n = flat.shape[0]
    budget = min(budget, n)
    iota = jnp.arange(n, dtype=jnp.int32)
    if sample_major:
        rank = (jnp.arange(K, dtype=jnp.int32)[None, :] * R
                + jnp.arange(R, dtype=jnp.int32)[:, None]).reshape(-1)
        pos = (jnp.cumsum(valid.T.reshape(-1).astype(jnp.int32))
               .reshape(K, R).T.reshape(-1)) - 1
    else:
        rank = iota
        pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    key = jnp.where(flat, rank, n)
    sorted_key, sorted_src = jax.lax.sort((key, iota), num_keys=1)
    src_idx = jax.lax.dynamic_slice_in_dim(sorted_src, 0, budget)
    slot_valid = jax.lax.dynamic_slice_in_dim(sorted_key, 0, budget) < n
    src_idx = jnp.where(slot_valid, src_idx, 0)
    keep = flat & (pos < budget)
    pos = jnp.where(keep, pos, budget - 1)
    return PackPlan(src_idx, pos, keep, slot_valid, flat.sum())


@jax.custom_vjp
def pack(x, plan: PackPlan):
    """x: (N, ...) -> (B, ...) gathered at the plan's source indices."""
    return jnp.take(x, plan.src_idx, axis=0)


def _pack_fwd(x, plan):
    return pack(x, plan), plan


def _zero_cotangent(plan: PackPlan) -> PackPlan:
    # integer/bool plan leaves get symbolic-zero (float0) cotangents
    import numpy as np
    return jax.tree_util.tree_map(
        lambda x: np.zeros(x.shape, jax.dtypes.float0), plan)


def _pack_bwd(plan, g):
    # transpose of the gather via the inverse mapping: row f of dx receives
    # g[pos[f]] iff f is a kept sample (bijection -> no scatter needed)
    dx = jnp.take(g, plan.pos, axis=0)
    mask = plan.keep.reshape((-1,) + (1,) * (g.ndim - 1))
    return jnp.where(mask, dx, 0.0), _zero_cotangent(plan)


pack.defvjp(_pack_fwd, _pack_bwd)


@jax.custom_vjp
def unpack(y, plan: PackPlan):
    """y: (B, ...) -> (N, ...): inverse of pack; non-kept slots are zero."""
    out = jnp.take(y, plan.pos, axis=0)
    mask = plan.keep.reshape((-1,) + (1,) * (y.ndim - 1))
    return jnp.where(mask, out, 0.0)


def _unpack_fwd(y, plan):
    return unpack(y, plan), plan


def _unpack_bwd(plan, g):
    dy = jnp.take(g, plan.src_idx, axis=0)
    mask = plan.slot_valid.reshape((-1,) + (1,) * (g.ndim - 1))
    return jnp.where(mask, dy, 0.0), _zero_cotangent(plan)


unpack.defvjp(_unpack_fwd, _unpack_bwd)
