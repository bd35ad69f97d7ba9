"""Bias-free MLPs, the TPU equivalent of tcnn's FullyFusedMLP
(`ngp_pl/models/networks.py:53-83`).

tcnn fully-fused networks have no bias terms; we keep that (it also keeps the
matmuls pure MXU work).  Params are fp32; compute can run in bfloat16 with
fp32 MXU accumulation (`preferred_element_type`) — the TPU analogue of the
reference's fp16 autocast (`rendering.py:117`).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def init_mlp(key, dims: Sequence[int], dtype=jnp.float32):
    """dims = [in, hidden..., out] -> list of (din, dout) weight matrices.

    Kaiming-uniform fan-in init (suits the ReLU hidden layers)."""
    ws = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        key, sub = jax.random.split(key)
        bound = (6.0 / din) ** 0.5
        ws.append(jax.random.uniform(sub, (din, dout), dtype,
                                     minval=-bound, maxval=bound))
    return ws


def mlp_apply(ws, x, *, compute_dtype=jnp.float32):
    """ReLU MLP forward; no activation on the output layer."""
    h = x.astype(compute_dtype)
    for w in ws[:-1]:
        h = jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        h = jnp.maximum(h, 0.0).astype(compute_dtype)
    out = jnp.dot(h, ws[-1].astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    return out  # fp32 via preferred_element_type
