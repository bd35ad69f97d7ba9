"""Morton (Z-order) encode/decode + bitfield packing as pure XLA int ops.

TPU-native replacements for the reference's CUDA kernels
`vren.morton3D / morton3D_invert / packbits` (call sites:
`ngp_pl/models/networks.py:128,147,153,251`).  The new framework keeps its
occupancy grid in raster (C, G, G, G) layout — these utilities exist for
API/test parity and for tools that want vren-compatible morton layouts.
"""
from __future__ import annotations

import jax.numpy as jnp


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of each uint32 out to every 3rd bit."""
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def _compress_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of _expand_bits: gather every 3rd bit into the low 10 bits."""
    v = v & jnp.uint32(0x49249249)
    v = (v | (v >> 2)) & jnp.uint32(0xC30C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0F00F00F)
    v = (v | (v >> 8)) & jnp.uint32(0xFF0000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x000003FF)
    return v


def morton3d(coords: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) int coords (each < 1024) -> (N,) int32 morton codes."""
    c = coords.astype(jnp.uint32)
    code = (_expand_bits(c[..., 0])
            | (_expand_bits(c[..., 1]) << 1)
            | (_expand_bits(c[..., 2]) << 2))
    return code.astype(jnp.int32)


def morton3d_invert(codes: jnp.ndarray) -> jnp.ndarray:
    """(N,) morton codes -> (N, 3) int32 coords."""
    v = codes.astype(jnp.uint32)
    return jnp.stack([
        _compress_bits(v),
        _compress_bits(v >> 1),
        _compress_bits(v >> 2),
    ], axis=-1).astype(jnp.int32)


def packbits(density_grid: jnp.ndarray, threshold) -> jnp.ndarray:
    """Pack a flat float grid into a uint8 bitfield, bit i of byte n set iff
    grid[8n+i] > threshold (vren `packbits` semantics, little-endian bits)."""
    flat = density_grid.reshape(-1)
    bits = (flat > threshold).reshape(-1, 8).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return (bits * weights[None, :]).sum(-1).astype(jnp.uint8)


def unpackbits(bitfield: jnp.ndarray) -> jnp.ndarray:
    """Inverse of packbits -> flat bool array of size 8*len(bitfield)."""
    b = bitfield.reshape(-1, 1)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return (((b >> shifts) & jnp.uint8(1)) > 0).reshape(-1)
