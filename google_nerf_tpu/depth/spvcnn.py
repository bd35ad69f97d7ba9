"""Reference-checkpoint-compatible SPVCNN executor (sparse 3-D convs).

The reference estimates focal-length scale and depth shift with a
torchsparse SPVCNN classifier (`Minist_Test/lib/spvcnn_classsification.py:
76-160`, fed by `test_utils.pcd_to_sparsetensor:25-57` at voxel sizes
0.005/0.01 and driven by `test_utils.refine_focal/refine_shift:112-131`).
`depth/voxelnet.py` keeps the dense 64^3 TPU redesign (fast, but it cannot
load the published SPVCNN weights).  This module executes the EXACT
reference architecture so converted checkpoints reproduce reference
outputs:

  * active voxels stay a coordinate LIST (N, 3) + feature rows (N, C) —
    at the reference's voxel_size the dense grid would be ~1000^3, which
    is exactly why the reference is sparse;
  * sparse convolution = per-offset neighbor lookup + per-offset matmul:
    neighbor lookup is a `searchsorted` of packed int32 coordinate keys
    against the sorted active-key table (two row gathers — the measured
    fast regime of the v5e gather law, DESIGN_NOTES round 7), and each
    kernel offset contributes `found * feats[idx] @ W[off]` — a (N, inc)
    x (inc, outc) MXU matmul.  No scatters anywhere (scatter-free law);
  * stride-2 downsampling builds the parent coordinate set by sort-unique
    (static shapes, validity masks), matching torchsparse's
    stride-quantized output sites;
  * the point branch (`voxel_to_point` trilinear devoxelize,
    `point_to_voxel` scatter-mean, `spvcnn_utils.py:62-107`) uses the
    same key queries; missing corners contribute zero exactly like
    `spdevoxelize` with idx=-1.

Everything is inference-mode (BatchNorm running stats), matching the
refiners' eval() usage (`test_shape.py:42-57`).

Weight conversion: `convert_spvcnn_state_dict` maps the torch state dict
(torchsparse `kernel` tensors of shape (K, inc, outc), K = k^3 kernel
offsets) onto this executor's pytree.  Kernel-offset order is torchsparse
`KernelRegion`'s meshgrid order (x outermost, z fastest; odd kernels span
-(k-1)/2..k/2, even kernels 0..k-1); if a checkpoint disagrees, pass
`offset_perm` to the converter.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# coordinate bound: packed int32 keys give 3 x 10 bits; coords are
# min-shifted to >= 0 by the voxelizer so 1024^3 covers ~10 m at the
# reference's 0.01 voxel size (out-of-range points are marked invalid)
CBITS = 10
CMAX = 1 << CBITS
_INVALID = jnp.int32(2 ** 31 - 1)

CS = (32, 32, 64, 128, 256)        # channel plan, spvcnn_classsification:83


def kernel_offsets(k: int) -> np.ndarray:
    """(k^3, 3) int offsets in torchsparse KernelRegion order (x outer,
    z fastest); odd k centered, even k forward."""
    lo = -(k - 1) // 2 if k % 2 else 0
    r = np.arange(lo, lo + k)
    g = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1)
    return g.reshape(-1, 3).astype(np.int32)


def _key(coords, valid):
    """(N, 3) int32 in [0, CMAX) -> packed sortable int32 key."""
    k = (coords[:, 0] << (2 * CBITS)) | (coords[:, 1] << CBITS) \
        | coords[:, 2]
    inb = jnp.all((coords >= 0) & (coords < CMAX), axis=1)
    return jnp.where(valid & inb, k, _INVALID)


def _lookup(table_keys, qkeys):
    """Sorted-table membership query: returns (row_idx, found)."""
    idx = jnp.searchsorted(table_keys, qkeys)
    idx = jnp.minimum(idx, table_keys.shape[0] - 1)
    found = (jnp.take(table_keys, idx) == qkeys) & (qkeys != _INVALID)
    return idx, found


class SparseLevel:
    """One resolution level: sorted unique voxel coords + validity.

    coords are in the level's own units (parent = child >> 1); `skey` is
    the packed sort key, ascending, invalid rows (key=_INVALID) at the
    tail."""

    def __init__(self, coords, valid):
        key = _key(coords, valid)
        order = jnp.argsort(key)
        self.coords = jnp.take(coords, order, axis=0)
        self.skey = jnp.take(key, order)
        self.valid = self.skey != _INVALID
        self.order = order

    def query(self, qcoords, qvalid):
        return _lookup(self.skey, _key(qcoords, qvalid))


def _unique_level(coords, valid):
    """Sort-unique a coordinate list -> SparseLevel of the distinct sites
    (duplicates invalidated, then re-sorted to the front)."""
    key = _key(coords, valid)
    order = jnp.argsort(key)
    skey = jnp.take(key, order)
    first = jnp.concatenate([jnp.ones((1,), bool), skey[1:] != skey[:-1]])
    ukey = jnp.where(first & (skey != _INVALID), skey, _INVALID)
    order2 = jnp.argsort(ukey)
    ukey = jnp.take(ukey, order2)
    ucoords = jnp.stack([(ukey >> (2 * CBITS)) & (CMAX - 1),
                         (ukey >> CBITS) & (CMAX - 1),
                         ukey & (CMAX - 1)], axis=1).astype(jnp.int32)
    lvl = SparseLevel.__new__(SparseLevel)
    lvl.coords = ucoords
    lvl.skey = ukey
    lvl.valid = ukey != _INVALID
    lvl.order = None
    return lvl


def sparse_conv(lvl_in: SparseLevel, feats, w, lvl_out: SparseLevel,
                stride: int = 1):
    """out[j] = sum_k found * feats[idx(coord_out*stride + off_k)] @ w[k].

    w: (K, inc, outc); offsets from kernel_offsets(round(K ** (1/3)))."""
    K = w.shape[0]
    k = round(K ** (1 / 3.0))
    offs = kernel_offsets(k)
    base = lvl_out.coords * stride
    out = jnp.zeros((lvl_out.coords.shape[0], w.shape[2]), feats.dtype)
    for ki in range(K):
        idx, found = lvl_in.query(base + offs[ki][None, :], lvl_out.valid)
        rows = jnp.take(feats, idx, axis=0) * found[:, None]
        out = out + rows @ w[ki]
    return out * lvl_out.valid[:, None]


def _bn(x, p, valid):
    inv = jax.lax.rsqrt(p["var"] + 1e-5)
    return (x - p["mean"]) * (inv * p["gamma"]) + p["beta"], valid


def _bn_relu(x, p, valid):
    y, _ = _bn(x, p, valid)
    return jnp.maximum(y, 0.0) * valid[:, None]


def _conv_bn_relu(lvl_in, feats, p, lvl_out, stride=1):
    h = sparse_conv(lvl_in, feats, p["conv"], lvl_out, stride)
    return _bn_relu(h, p["bn"], lvl_out.valid)


def _residual(lvl, feats, p):
    """spvcnn_classsification.ResidualBlock (stride 1)."""
    h = _conv_bn_relu(lvl, feats, p["c1"], lvl)
    h = sparse_conv(lvl, h, p["c2"]["conv"], lvl)
    h, _ = _bn(h, p["c2"]["bn"], lvl.valid)
    if "down" in p:
        idn = sparse_conv(lvl, feats, p["down"]["conv"], lvl)
        idn, _ = _bn(idn, p["down"]["bn"], lvl.valid)
    else:
        idn = feats
    return jnp.maximum(h + idn, 0.0) * lvl.valid[:, None]


def _downsample_level(lvl: SparseLevel) -> SparseLevel:
    """Parent sites of a stride-2 conv: unique(floor(child / 2))."""
    return _unique_level(lvl.coords >> 1, lvl.valid)


def voxelize(points: np.ndarray, feats: np.ndarray, voxel_size: float,
             n_cap: int = 65536):
    """Host-side `pcd_to_sparsetensor` (test_utils.py:25-57): round to the
    voxel lattice, min-shift to >= 0, keep the FIRST point per voxel.
    Returns fixed-size (n_cap, 3) int32 coords, (n_cap, C) f32 feats,
    (n_cap,) bool valid."""
    pc = np.round(points / voxel_size)
    pc -= pc.min(0, keepdims=True)
    key = (pc[:, 0] * CMAX + pc[:, 1]) * CMAX + pc[:, 2]
    _, first = np.unique(key, return_index=True)
    first = np.sort(first)
    if first.size > n_cap:
        first = np.random.default_rng(0).choice(first, n_cap, replace=False)
    coords = np.zeros((n_cap, 3), np.int32)
    f = np.zeros((n_cap, feats.shape[1]), np.float32)
    valid = np.zeros((n_cap,), bool)
    n = first.size
    coords[:n] = pc[first]
    f[:n] = feats[first]
    valid[:n] = True
    return coords, f, valid


@functools.partial(jax.jit, static_argnames=())
def spvcnn_apply(params, coords, feats, valid):
    """Run the SPVCNN classifier on a voxelized cloud -> (1,) logit.

    Mirrors `SPVCNN_CLASSIFICATION.forward` (spvcnn_classsification.py:
    131-160) with pres == vres (the refiners' setting, test_shape.py:
    46-53): initial_voxelize is then the identity on the pre-deduped
    input, and the stem-level `voxel_to_point` (integer coords, zero
    trilinear fraction) reduces to the site's own feature row."""
    lvl0 = SparseLevel(coords, valid)
    f0 = jnp.take(feats, lvl0.order, axis=0) * lvl0.valid[:, None]

    # stem: two 3^3 stride-1 conv+BN+ReLU
    h = _conv_bn_relu(lvl0, f0, params["stem"][0], lvl0)
    h = _conv_bn_relu(lvl0, h, params["stem"][1], lvl0)
    z0 = h                                     # voxel_to_point(x0, z)

    # four stages: 2^3 stride-2 conv + 2 residual blocks each
    lvl, feats_l = lvl0, h
    levels = []
    for st in params["stages"]:
        nxt = _downsample_level(lvl)
        feats_l = _conv_bn_relu(lvl, feats_l, st["down"], nxt, stride=2)
        feats_l = _residual(nxt, feats_l, st["res1"])
        feats_l = _residual(nxt, feats_l, st["res2"])
        levels.append(nxt)
        lvl = nxt

    # point branch: z1 = trilinear devoxelize of x4 at the point coords
    # (stride 16), + point_transforms(z0)   (spvcnn_utils.voxel_to_point:
    # 65-107; weights of missing corners contribute zero, no renorm)
    x4, l4 = feats_l, lvl
    pos = lvl0.coords.astype(jnp.float32) / 16.0
    base = jnp.floor(pos).astype(jnp.int32)
    frac = pos - base
    z1 = jnp.zeros((coords.shape[0], x4.shape[1]), x4.dtype)
    for corner in range(8):
        off = jnp.asarray([(corner >> 2) & 1, (corner >> 1) & 1,
                           corner & 1], jnp.int32)
        w = jnp.prod(jnp.where(off[None, :] == 1, frac, 1.0 - frac), 1)
        idx, found = l4.query(base + off[None, :], lvl0.valid)
        z1 = z1 + (w * found)[:, None] * jnp.take(x4, idx, axis=0)
    pt = params["point_transform"]
    zt = _bn_relu(z0 @ pt["w"].T + pt["b"], pt["bn"], lvl0.valid)
    z1 = (z1 + zt) * lvl0.valid[:, None]

    # point_to_voxel scatter-mean onto x4's active sites, then global
    # average pool over active voxels (spvcnn_utils.point_to_voxel:36-60,
    # spnn.GlobalAveragePooling)
    pidx, pfound = l4.query(lvl0.coords >> 4, lvl0.valid)
    # scatter-free segment mean: sort point rows by their parent slot
    slot = jnp.where(pfound, pidx, l4.coords.shape[0])
    order = jnp.argsort(slot)
    slot_s = jnp.take(slot, order)
    rows_s = jnp.take(z1, order, axis=0)
    csum = jnp.cumsum(rows_s, axis=0)
    ccnt = jnp.cumsum(jnp.ones_like(slot_s, jnp.float32))
    last = jnp.searchsorted(slot_s, jnp.arange(l4.coords.shape[0]),
                            side="right") - 1
    firstm1 = jnp.searchsorted(slot_s, jnp.arange(l4.coords.shape[0]),
                               side="left") - 1
    seg = jnp.take(csum, jnp.maximum(last, 0), axis=0) \
        - jnp.where((firstm1 >= 0)[:, None],
                    jnp.take(csum, jnp.maximum(firstm1, 0), axis=0), 0.0)
    cnt = jnp.take(ccnt, jnp.maximum(last, 0)) \
        - jnp.where(firstm1 >= 0, jnp.take(ccnt, jnp.maximum(firstm1, 0)),
                    0.0)
    has = (last >= firstm1 + 1) & l4.valid
    y1 = jnp.where(has[:, None], seg / jnp.maximum(cnt, 1.0)[:, None], 0.0)

    n_act = jnp.maximum(l4.valid.sum(), 1)
    pool = y1.sum(0) / n_act
    cl = params["classifier"]
    return pool @ cl["w"].T + cl["b"]


# ---------------------------------------------------------------------------
# parameter pytree: init + torch state-dict conversion
# ---------------------------------------------------------------------------

def _conv_p(key, k, inc, outc):
    fan = k ** 3 * inc
    return {"conv": jax.random.normal(key, (k ** 3, inc, outc),
                                      jnp.float32) / np.sqrt(fan),
            "bn": _bn_p(outc)}


def _bn_p(c):
    return {"gamma": jnp.ones((c,)), "beta": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def init_spvcnn(key, input_channel: int, num_classes: int = 1,
                cr: float = 1.0):
    cs = [int(cr * c) for c in CS]
    ks = jax.random.split(key, 32)
    i = iter(range(32))
    p = {"stem": [_conv_p(ks[next(i)], 3, input_channel, cs[0]),
                  _conv_p(ks[next(i)], 3, cs[0], cs[0])],
         "stages": []}
    chans = [(cs[0], cs[1]), (cs[1], cs[2]), (cs[2], cs[3]), (cs[3], cs[4])]
    for inc, outc in chans:
        st = {"down": _conv_p(ks[next(i)], 2, inc, inc),
              "res1": {"c1": _conv_p(ks[next(i)], 3, inc, outc),
                       "c2": _conv_p(ks[next(i)], 3, outc, outc)},
              "res2": {"c1": _conv_p(ks[next(i)], 3, outc, outc),
                       "c2": _conv_p(ks[next(i)], 3, outc, outc)}}
        if inc != outc:
            st["res1"]["down"] = _conv_p(ks[next(i)], 1, inc, outc)
        p["stages"].append(st)
    kw = ks[next(i)]
    p["point_transform"] = {
        "w": jax.random.normal(kw, (cs[4], cs[0])) / np.sqrt(cs[0]),
        "b": jnp.zeros((cs[4],)), "bn": _bn_p(cs[4])}
    kc = ks[next(i)]
    p["classifier"] = {
        "w": jax.random.normal(kc, (num_classes, cs[4])) / np.sqrt(cs[4]),
        "b": jnp.zeros((num_classes,))}
    return p


def _t2j(t):
    return jnp.asarray(np.asarray(t, dtype=np.float32))


def _conv_from(sd, prefix, offset_perm=None):
    w = np.asarray(sd[prefix + ".kernel"], np.float32)
    if w.ndim == 2:                     # ks=1: torchsparse stores (inc, outc)
        w = w[None]
    if offset_perm is not None:
        w = w[offset_perm]
    return jnp.asarray(w)


def _bn_from(sd, prefix):
    return {"gamma": _t2j(sd[prefix + ".weight"]),
            "beta": _t2j(sd[prefix + ".bias"]),
            "mean": _t2j(sd[prefix + ".running_mean"]),
            "var": _t2j(sd[prefix + ".running_var"])}


def convert_spvcnn_state_dict(sd, cr: float = 1.0, offset_perm=None):
    """torch state dict (SPVCNN_CLASSIFICATION) -> executor pytree.

    `offset_perm`: optional (k^3,) permutation applied to every kernel's
    offset axis if the checkpoint's KernelRegion order differs from
    `kernel_offsets` (meshgrid x-outer/z-fastest)."""
    cs = [int(cr * c) for c in CS]

    def cbr(prefix):
        return {"conv": _conv_from(sd, prefix + ".0", offset_perm),
                "bn": _bn_from(sd, prefix + ".1")}

    def res(prefix, inc, outc):
        r = {"c1": {"conv": _conv_from(sd, prefix + ".net.0", offset_perm),
                    "bn": _bn_from(sd, prefix + ".net.1")},
             "c2": {"conv": _conv_from(sd, prefix + ".net.3", offset_perm),
                    "bn": _bn_from(sd, prefix + ".net.4")}}
        if inc != outc:
            r["down"] = {"conv": _conv_from(sd, prefix + ".downsample.0",
                                            offset_perm),
                         "bn": _bn_from(sd, prefix + ".downsample.1")}
        return r

    p = {"stem": [cbr("stem.0-2")
                  if "stem.0-2.0.kernel" in sd else
                  {"conv": _conv_from(sd, "stem.0", offset_perm),
                   "bn": _bn_from(sd, "stem.1")},
                  {"conv": _conv_from(sd, "stem.3", offset_perm),
                   "bn": _bn_from(sd, "stem.4")}],
         "stages": []}
    chans = [(cs[0], cs[1]), (cs[1], cs[2]), (cs[2], cs[3]), (cs[3], cs[4])]
    for si, (inc, outc) in enumerate(chans, start=1):
        p["stages"].append({
            "down": {"conv": _conv_from(sd, f"stage{si}.0.net.0",
                                        offset_perm),
                     "bn": _bn_from(sd, f"stage{si}.0.net.1")},
            "res1": res(f"stage{si}.1", inc, outc),
            "res2": res(f"stage{si}.2", outc, outc)})
    p["point_transform"] = {
        "w": _t2j(sd["point_transforms.0.0.weight"]),
        "b": _t2j(sd["point_transforms.0.0.bias"]),
        "bn": _bn_from(sd, "point_transforms.0.1")}
    p["classifier"] = {"w": _t2j(sd["classifier.0.weight"]),
                       "b": _t2j(sd["classifier.0.bias"])}
    return p


# ---------------------------------------------------------------------------
# refiners on the SPVCNN head (test_utils.py:90-131 semantics)
# ---------------------------------------------------------------------------

def _image_coords(h, w, u0, v0):
    u = np.arange(w)[None, :].repeat(h, 0) - u0
    v = np.arange(h)[:, None].repeat(w, 1) - v0
    return u, v


def refine_shift_spvcnn(depth_wshift: np.ndarray, params, focal: float,
                        u0: float, v0: float, max_shift: float = 0.7):
    """One shift-recovery step (`test_utils.refine_shift:121-131`):
    depth -> pcd -> voxelize(0.01) -> SPVCNN(3ch) -> clamp at 0.7."""
    h, w = depth_wshift.shape
    u, v = _image_coords(h, w, u0, v0)
    mask = depth_wshift > 1e-8
    x = depth_wshift * u / focal
    y = depth_wshift * v / focal
    pcd = np.stack([x, y, depth_wshift], -1)[mask]
    coords, feats, valid = voxelize(pcd, pcd, voxel_size=0.01)
    out = spvcnn_apply(params, jnp.asarray(coords), jnp.asarray(feats),
                       jnp.asarray(valid))
    return min(float(out[0]), max_shift)


def refine_focal_spvcnn(depth: np.ndarray, params, focal: float,
                        u0: float, v0: float):
    """One focal-recovery step (`test_utils.refine_focal:112-119`):
    features are [xyz, (u-u0)/f, (v-v0)/f], voxel 0.005, SPVCNN(5ch)."""
    h, w = depth.shape
    u, v = _image_coords(h, w, u0, v0)
    mask = depth > 1e-8
    x = depth * u / focal
    y = depth * v / focal
    pcd = np.stack([x, y, depth], -1)[mask]
    uv = np.stack([u[mask] / focal, v[mask] / focal], -1)
    feats = np.concatenate([pcd, uv], 1)
    coords, f, valid = voxelize(pcd, feats, voxel_size=0.005)
    out = spvcnn_apply(params, jnp.asarray(coords), jnp.asarray(f),
                       jnp.asarray(valid))
    return float(out[0])
