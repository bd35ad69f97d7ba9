import pytest
"""Numeric tests of the marcher/compositor against naive per-ray loops that
replicate the vren CUDA semantics (SURVEY.md §4 test strategy)."""
import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.ops.composite import (composite_rays_test_round,
                                           composite_rays_train)
from google_nerf_tpu.ops.marching import (SQRT3, calc_dt, march_rays_train,
                                          march_rays_test_round,
                                          mip_from_dt, mip_from_pos,
                                          occupancy_lookup)
from google_nerf_tpu.ops.ray_aabb import ray_aabb_intersect

GRID = 32
SCALE = 0.5
MAX_SAMPLES = 128
CASCADES = 1


def _make_occ_grid(rng):
    """Random-ish occupancy: a solid ball of radius 0.25 plus noise."""
    g = np.arange(GRID)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    centers = ((np.stack([x, y, z], -1) + 0.5) / GRID * 2 - 1) * SCALE
    occ = (np.linalg.norm(centers, axis=-1) < 0.25)
    occ |= rng.rand(GRID, GRID, GRID) < 0.05
    return occ[None]  # (C=1, G, G, G)


def _naive_march(o, d, t1, t2, occ, noise, K):
    """Replicates vren raymarching_train for exp_step_factor=0 (constant dt;
    the empty-space skip advances t by whole dt multiples so a plain lattice
    walk is equivalent)."""
    dt = SQRT3 / MAX_SAMPLES
    samples = []
    t = t1 + dt * noise
    while t < t2 and len(samples) < K:
        xyz = o + t * d
        mx = np.max(np.abs(xyz))
        # single cascade: bound = min(2^-1, scale)
        bound = min(0.5, SCALE)
        nf = np.clip(0.5 * (xyz / bound + 1) * GRID, 0, GRID - 1).astype(int)
        if occ[0, nf[0], nf[1], nf[2]]:
            samples.append((t, dt))
        t += dt
    return samples


def test_mip_helpers():
    xyz = jnp.array([[0.3, 0.1, 0.0], [0.7, 0.0, 0.0], [1.5, 0.0, 0.0]])
    np.testing.assert_array_equal(mip_from_pos(xyz, 5), [0, 1, 2])
    np.testing.assert_array_equal(
        mip_from_dt(jnp.array([0.5 / 128, 1.5 / 128, 2.5 / 128]), 128, 5),
        [0, 1, 2])
    # clamping to cascades-1
    np.testing.assert_array_equal(mip_from_pos(xyz, 1), [0, 0, 0])


def test_calc_dt_clamps():
    v = np.asarray(calc_dt(jnp.array([0.0, 1e9]), 1 / 256, 1024, 128, 0.5))
    np.testing.assert_allclose(v[0], SQRT3 / 1024, rtol=1e-6)
    np.testing.assert_allclose(v[1], SQRT3 * 2 * 0.5 / 128, rtol=1e-6)


def test_occupancy_lookup_matches_manual():
    rng = np.random.RandomState(0)
    occ = _make_occ_grid(rng)
    pts = (rng.rand(200, 3) * 2 - 1) * SCALE * 0.99
    dt = np.full(200, SQRT3 / MAX_SAMPLES, np.float32)
    got = np.asarray(occupancy_lookup(
        jnp.asarray(occ), jnp.asarray(pts, jnp.float32), jnp.asarray(dt),
        CASCADES, SCALE, GRID))
    bound = min(0.5, SCALE)
    nf = np.clip(0.5 * (pts / bound + 1) * GRID, 0, GRID - 1).astype(int)
    want = occ[0, nf[:, 0], nf[:, 1], nf[:, 2]]
    np.testing.assert_array_equal(got, want)


def test_march_train_matches_naive():
    rng = np.random.RandomState(1)
    occ = _make_occ_grid(rng)
    R, K = 32, 48
    o = np.zeros((R, 3), np.float32)
    o[:, 2] = -1.5
    o[:, :2] = (rng.rand(R, 2) - 0.5) * 0.6
    d = np.zeros((R, 3), np.float32)
    d[:, 2] = 1.0
    noise = rng.rand(R).astype(np.float32)

    hits = ray_aabb_intersect(jnp.asarray(o), jnp.asarray(d),
                              jnp.zeros(3), SCALE * jnp.ones(3))
    res = march_rays_train(
        jnp.asarray(o), jnp.asarray(d), hits, jnp.asarray(occ),
        cascades=CASCADES, scale=SCALE, exp_step_factor=0.0, grid_size=GRID,
        max_samples=MAX_SAMPLES, k_samples=K, noise=jnp.asarray(noise))

    hits_np = np.asarray(hits)
    total = 0
    for r in range(R):
        want = _naive_march(o[r], d[r], hits_np[r, 0], hits_np[r, 1],
                            occ, noise[r], K)
        got_valid = np.asarray(res["valid"][r])
        got_ts = np.asarray(res["ts"][r])[got_valid]
        want_ts = np.array([t for t, _ in want])
        assert got_valid.sum() == len(want), f"ray {r}"
        np.testing.assert_allclose(got_ts, want_ts, atol=1e-5)
        total += len(want)
    assert int(res["total_samples"]) == total
    # xyz consistency
    v = np.asarray(res["valid"])
    xyz = np.asarray(res["xyzs"])
    ts = np.asarray(res["ts"])
    want_xyz = o[:, None] + ts[..., None] * d[:, None]
    np.testing.assert_allclose(xyz[v], want_xyz[v], atol=1e-6)


def _naive_composite(sigmas, rgbs, deltas, ts, valid, thresh):
    """vren composite_train_fw per-ray loop."""
    T, opa, dep, dsq, rgb = 1.0, 0.0, 0.0, 0.0, np.zeros(3)
    for i in range(len(sigmas)):
        if not valid[i]:
            continue
        a = 1 - np.exp(-sigmas[i] * deltas[i])
        w = a * T
        rgb = rgb + w * rgbs[i]
        dep += w * ts[i]
        dsq += w * ts[i] ** 2
        opa += w
        T *= 1 - a
        if T <= thresh:
            break
    return opa, dep, dsq, rgb


def test_composite_train_matches_naive():
    rng = np.random.RandomState(2)
    R, K = 16, 32
    sigmas = (rng.rand(R, K) * 30).astype(np.float32)
    rgbs = rng.rand(R, K, 3).astype(np.float32)
    deltas = np.full((R, K), 0.01, np.float32)
    ts = np.cumsum(deltas, -1).astype(np.float32)
    valid = rng.rand(R, K) > 0.3
    out = composite_rays_train(*(jnp.asarray(a) for a in
                                 (sigmas, rgbs, deltas, ts, valid)),
                               T_threshold=1e-4)
    for r in range(R):
        opa, dep, dsq, rgb = _naive_composite(sigmas[r], rgbs[r], deltas[r],
                                              ts[r], valid[r], 1e-4)
        np.testing.assert_allclose(out["opacity"][r], opa, rtol=2e-4)
        np.testing.assert_allclose(out["depth"][r], dep, rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(out["depth_sq"][r], dsq, rtol=2e-4,
                                   atol=1e-6)
        np.testing.assert_allclose(out["rgb"][r], rgb, rtol=2e-4, atol=1e-6)


def test_composite_gradients_finite():
    rng = np.random.RandomState(3)
    R, K = 4, 8
    sigmas = jnp.asarray(rng.rand(R, K).astype(np.float32))
    rgbs = jnp.asarray(rng.rand(R, K, 3).astype(np.float32))
    deltas = jnp.full((R, K), 0.1)
    ts = jnp.cumsum(deltas, -1)
    valid = jnp.asarray(rng.rand(R, K) > 0.2)

    def loss(s, c):
        out = composite_rays_train(s, c, deltas, ts, valid)
        return out["rgb"].sum() + out["opacity"].sum()

    gs, gc = jax.grad(loss, argnums=(0, 1))(sigmas, rgbs)
    assert np.isfinite(np.asarray(gs)).all()
    assert np.isfinite(np.asarray(gc)).all()
    # invalid samples must receive zero gradient
    v = np.asarray(valid)
    assert np.all(np.asarray(gs)[~v] == 0)


@pytest.mark.slow
def test_test_round_marching_resumes_correctly():
    """Rounds of (march_test + composite_test) must reproduce the one-shot
    train-time march/composite when the model is deterministic."""
    rng = np.random.RandomState(4)
    occ = _make_occ_grid(rng)
    R = 16
    o = np.zeros((R, 3), np.float32)
    o[:, 2] = -1.5
    o[:, :2] = (rng.rand(R, 2) - 0.5) * 0.5
    d = np.zeros((R, 3), np.float32)
    d[:, 2] = 1.0
    o, d = jnp.asarray(o), jnp.asarray(d)
    hits = ray_aabb_intersect(o, d, jnp.zeros(3), SCALE * jnp.ones(3))

    def fake_model(xyz):
        sig = 20.0 * (jnp.linalg.norm(xyz, axis=-1) < 0.25)
        col = jnp.stack([xyz[..., 0] + 0.5, xyz[..., 1] + 0.5,
                         jnp.ones_like(xyz[..., 0]) * 0.3], -1)
        return sig, col

    # one-shot reference via the training path (no noise)
    res = march_rays_train(o, d, hits, jnp.asarray(occ), cascades=CASCADES,
                           scale=SCALE, exp_step_factor=0.0, grid_size=GRID,
                           max_samples=MAX_SAMPLES, k_samples=MAX_SAMPLES,
                           noise=jnp.zeros(R))
    sig, col = fake_model(res["xyzs"])
    ref = composite_rays_train(sig, col, res["deltas"], res["ts"],
                               res["valid"])

    # round-based test path
    t_cur = jnp.maximum(hits[:, 0], 0.0)
    t2 = hits[:, 1]
    T = jnp.ones(R)
    opacity = jnp.zeros(R)
    depth = jnp.zeros(R)
    rgb = jnp.zeros((R, 3))
    alive = hits[:, 0] >= 0
    for _ in range(40):
        mr = march_rays_test_round(o, d, t_cur, t2, alive, jnp.asarray(occ),
                                   cascades=CASCADES, scale=SCALE,
                                   exp_step_factor=0.0, grid_size=GRID,
                                   max_samples=MAX_SAMPLES, n_cand=32,
                                   k_samples=8)
        sig, col = fake_model(mr["xyzs"])
        T, opacity, depth, rgb = composite_rays_test_round(
            sig, col, mr["deltas"], mr["ts"], mr["valid"], T, opacity, depth,
            rgb)
        t_cur = mr["t_next"]
        alive = alive & (T > 1e-4) & (t_cur < t2)

    np.testing.assert_allclose(opacity, ref["opacity"], atol=1e-4)
    np.testing.assert_allclose(depth, ref["depth"], atol=1e-4)
    np.testing.assert_allclose(rgb, ref["rgb"], atol=1e-4)
