"""SPVCNN sparse executor vs an independent dict-based numpy restatement.

The executor (depth/spvcnn.py) implements torchsparse semantics
(reference `Minist_Test/lib/spvcnn_classsification.py`,
`spvcnn_utils.py`) with sort-based key queries; the oracle here recomputes
every layer with python dicts keyed by coordinate tuples — no sorting, no
masks — so agreement validates the whole static-shape machinery."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from google_nerf_tpu.depth.spvcnn import (CS, convert_spvcnn_state_dict,
                                          init_spvcnn, kernel_offsets,
                                          refine_shift_spvcnn, spvcnn_apply,
                                          voxelize)


def _np(p):
    return jax.tree_util.tree_map(np.asarray, p)


# ---------------------------------------------------------------- oracle

def _o_conv(sites, w, out_sites, stride=1):
    K = w.shape[0]
    k = round(K ** (1 / 3.0))
    offs = kernel_offsets(k)
    out = {}
    for c in out_sites:
        acc = np.zeros(w.shape[2], np.float64)
        base = np.asarray(c) * stride
        for ki in range(K):
            nb = tuple(base + offs[ki])
            if nb in sites:
                acc += sites[nb] @ w[ki]
        out[c] = acc
    return out


def _o_bn(sites, p, relu):
    g, b = p["bn"]["gamma"], p["bn"]["beta"]
    m, v = p["bn"]["mean"], p["bn"]["var"]
    out = {}
    for c, f in sites.items():
        y = (f - m) / np.sqrt(v + 1e-5) * g + b
        out[c] = np.maximum(y, 0.0) if relu else y
    return out


def _o_cbr(sites, p, out_sites=None, stride=1):
    out_sites = list(sites) if out_sites is None else out_sites
    return _o_bn(_o_conv(sites, p["conv"], out_sites, stride), p, True)


def _o_res(sites, p):
    h = _o_cbr(sites, p["c1"])
    h = _o_bn(_o_conv(h, p["c2"]["conv"], list(sites)), p["c2"], False)
    if "down" in p:
        idn = _o_bn(_o_conv(sites, p["down"]["conv"], list(sites)),
                    p["down"], False)
    else:
        idn = sites
    return {c: np.maximum(h[c] + idn[c], 0.0) for c in sites}


def oracle(params, coords, feats):
    p = _np(params)
    sites = {tuple(c): f.astype(np.float64)
             for c, f in zip(coords, feats)}
    h = _o_cbr(sites, p["stem"][0])
    h = _o_cbr(h, p["stem"][1])
    z0 = dict(h)
    for st in p["stages"]:
        parents = sorted({tuple(np.asarray(c) // 2) for c in h})
        h = _o_cbr(h, st["down"], out_sites=parents, stride=2)
        h = _o_res(h, st["res1"])
        h = _o_res(h, st["res2"])
    x4 = h
    # point branch: trilinear devoxelize of x4 at coords/16 + transform(z0)
    pt = p["point_transform"]
    z1 = {}
    for c in z0:
        pos = np.asarray(c, np.float64) / 16.0
        base = np.floor(pos).astype(int)
        frac = pos - base
        acc = np.zeros(len(pt["b"]), np.float64)
        for k in range(8):
            off = np.array([(k >> 2) & 1, (k >> 1) & 1, k & 1])
            nb = tuple(base + off)
            if nb in x4:
                w = np.prod(np.where(off == 1, frac, 1 - frac))
                acc += w * x4[nb]
        zt = z0[c] @ pt["w"].T + pt["b"]
        zt = (zt - pt["bn"]["mean"]) / np.sqrt(pt["bn"]["var"] + 1e-5) \
            * pt["bn"]["gamma"] + pt["bn"]["beta"]
        z1[c] = acc + np.maximum(zt, 0.0)
    # scatter-mean onto x4 sites, masked global average pool
    sums = {c: np.zeros(len(next(iter(z1.values())))) for c in x4}
    cnts = {c: 0 for c in x4}
    for c, f in z1.items():
        parent = tuple(np.asarray(c) // 16)
        if parent in sums:
            sums[parent] += f
            cnts[parent] += 1
    pooled = np.mean(
        [sums[c] / cnts[c] if cnts[c] else np.zeros_like(sums[c])
         for c in x4], axis=0)
    cl = p["classifier"]
    return pooled @ cl["w"].T + cl["b"]


# ----------------------------------------------------------------- tests

def _cloud(n=120, span=60, c=3, seed=0):
    rng = np.random.default_rng(seed)
    coords = rng.integers(0, span, size=(n, 3)).astype(np.int32)
    key = (coords[:, 0] * 1024 + coords[:, 1]) * 1024 + coords[:, 2]
    _, first = np.unique(key, return_index=True)
    coords = coords[np.sort(first)]
    feats = rng.normal(size=(coords.shape[0], c)).astype(np.float32)
    return coords, feats


@pytest.mark.slow
def test_spvcnn_matches_dict_oracle():
    coords, feats = _cloud()
    params = init_spvcnn(jax.random.PRNGKey(0), input_channel=3,
                         num_classes=1, cr=0.25)
    n_cap = 160
    pad = n_cap - coords.shape[0]
    coords_p = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
    feats_p = np.concatenate([feats, np.zeros((pad, 3), np.float32)])
    valid = np.concatenate([np.ones(coords.shape[0], bool),
                            np.zeros(pad, bool)])
    got = np.asarray(spvcnn_apply(params, jnp.asarray(coords_p),
                                  jnp.asarray(feats_p),
                                  jnp.asarray(valid)))
    want = oracle(params, coords, feats)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_spvcnn_padding_invariance():
    coords, feats = _cloud(n=60, span=40)
    params = init_spvcnn(jax.random.PRNGKey(1), input_channel=3, cr=0.25)

    def run(n_cap):
        pad = n_cap - coords.shape[0]
        cp = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
        fp = np.concatenate([feats, np.zeros((pad, 3), np.float32)])
        vp = np.concatenate([np.ones(coords.shape[0], bool),
                             np.zeros(pad, bool)])
        return np.asarray(spvcnn_apply(params, jnp.asarray(cp),
                                       jnp.asarray(fp), jnp.asarray(vp)))

    np.testing.assert_allclose(run(96), run(200), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_convert_state_dict_shapes_and_run():
    """A synthetic torch-style state dict (reference module names,
    torchsparse kernel layout (k^3, inc, outc)) converts and runs."""
    rng = np.random.default_rng(0)
    cs = list(CS)
    sd = {}

    def conv(name, k, inc, outc):
        sd[name + ".kernel"] = rng.normal(
            size=(k ** 3, inc, outc) if k > 1 else (inc, outc)) \
            .astype(np.float32) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = np.ones(c, np.float32)
        sd[name + ".bias"] = np.zeros(c, np.float32)
        sd[name + ".running_mean"] = np.zeros(c, np.float32)
        sd[name + ".running_var"] = np.ones(c, np.float32)

    conv("stem.0", 3, 3, cs[0]); bn("stem.1", cs[0])
    conv("stem.3", 3, cs[0], cs[0]); bn("stem.4", cs[0])
    chans = [(cs[0], cs[1]), (cs[1], cs[2]), (cs[2], cs[3]), (cs[3], cs[4])]
    for si, (inc, outc) in enumerate(chans, start=1):
        conv(f"stage{si}.0.net.0", 2, inc, inc); bn(f"stage{si}.0.net.1", inc)
        conv(f"stage{si}.1.net.0", 3, inc, outc); bn(f"stage{si}.1.net.1", outc)
        conv(f"stage{si}.1.net.3", 3, outc, outc); bn(f"stage{si}.1.net.4", outc)
        if inc != outc:
            conv(f"stage{si}.1.downsample.0", 1, inc, outc)
            bn(f"stage{si}.1.downsample.1", outc)
        conv(f"stage{si}.2.net.0", 3, outc, outc); bn(f"stage{si}.2.net.1", outc)
        conv(f"stage{si}.2.net.3", 3, outc, outc); bn(f"stage{si}.2.net.4", outc)
    sd["point_transforms.0.0.weight"] = rng.normal(
        size=(cs[4], cs[0])).astype(np.float32) * 0.05
    sd["point_transforms.0.0.bias"] = np.zeros(cs[4], np.float32)
    bn("point_transforms.0.1", cs[4])
    sd["classifier.0.weight"] = rng.normal(size=(1, cs[4])) \
        .astype(np.float32) * 0.05
    sd["classifier.0.bias"] = np.zeros(1, np.float32)

    params = convert_spvcnn_state_dict(sd)
    coords, feats = _cloud(n=40, span=50)
    pad = 64 - coords.shape[0]
    cp = np.concatenate([coords, np.zeros((pad, 3), np.int32)])
    fp = np.concatenate([feats, np.zeros((pad, 3), np.float32)])
    vp = np.concatenate([np.ones(coords.shape[0], bool),
                         np.zeros(pad, bool)])
    out = np.asarray(spvcnn_apply(params, jnp.asarray(cp), jnp.asarray(fp),
                                  jnp.asarray(vp)))
    assert out.shape == (1,) and np.isfinite(out).all()


def test_refine_shift_runs():
    # this compile segfaulted XLA:CPU deterministically when reached with
    # the FULL suite's accumulated executable state (~200 tests in; passes
    # in isolation and after any ~30-test subset — r5 bisect).  Dropping
    # the suite's live executables before the large pjit compile avoids
    # the crash; persistent cache is already off under pytest (conftest).
    jax.clear_caches()
    rng = np.random.default_rng(0)
    depth = (1.0 + rng.random((24, 32))).astype(np.float32)
    params = init_spvcnn(jax.random.PRNGKey(2), input_channel=3, cr=0.25)
    s = refine_shift_spvcnn(depth, params, focal=30.0, u0=16.0, v0=12.0)
    assert np.isfinite(s) and s <= 0.7


def test_voxelize_dedups_first():
    pts = np.array([[0.0, 0.0, 0.0], [0.004, 0.0, 0.0], [0.1, 0.0, 0.0]])
    feats = np.array([[1.0], [2.0], [3.0]])
    coords, f, valid = voxelize(pts, feats, voxel_size=0.01, n_cap=8)
    assert valid.sum() == 2          # first two share a voxel after round
    assert f[0, 0] == 1.0            # FIRST point kept (sparse_quantize)
