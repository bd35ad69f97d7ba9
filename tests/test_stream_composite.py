"""Stream-space composite == padded composite on every budget-kept ray.

The budget branch of render_train composites directly over the ray-major
packed stream (ops/stream_composite.py); results must match the padded
(R, K) composite bit-for-bit wherever ray_mask is True.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from google_nerf_tpu.ops.compaction import pack, plan_packing
from google_nerf_tpu.ops.composite import composite_rays_train
from google_nerf_tpu.ops.stream_composite import composite_stream_train


def _fixture(key, R=64, K=16, budget=512):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    count = jax.random.randint(k1, (R,), 0, K + 1)
    valid = jnp.arange(K)[None, :] < count[:, None]   # prefix-valid rows
    sig = jnp.abs(jax.random.normal(k2, (R, K))) * 20
    rgb = jax.random.uniform(k3, (R, K, 3))
    ts = jnp.sort(jax.random.uniform(k4, (R, K)), axis=-1) + 0.1
    dt = jnp.full((R, K), 0.01)
    return valid, sig, rgb, dt, ts


@pytest.mark.parametrize("budget", [1024, 300])
def test_stream_matches_padded(budget):
    R, K = 64, 16
    valid, sig, rgb, dt, ts = _fixture(jax.random.PRNGKey(0), R, K)
    ref = composite_rays_train(sig, rgb, dt, ts, valid, 1e-4)
    plan = plan_packing(valid, budget, sample_major=False)
    keep2d = plan.keep.reshape(R, K)
    ray_mask = np.asarray(~jnp.any(valid & ~keep2d, axis=-1))
    got = composite_stream_train(
        plan, pack(sig.reshape(-1), plan),
        pack(rgb.reshape(-1, 3), plan), pack(dt.reshape(-1), plan),
        pack(ts.reshape(-1), plan), R, K, 1e-4)
    for k in ("opacity", "depth", "depth_sq", "rgb"):
        np.testing.assert_allclose(np.asarray(got[k])[ray_mask],
                                   np.asarray(ref[k])[ray_mask],
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    if budget == 1024:    # whole batch kept
        assert ray_mask.all()


@pytest.mark.slow
def test_stream_gradients_match():
    R, K, budget = 32, 8, 256
    valid, sig, rgb, dt, ts = _fixture(jax.random.PRNGKey(1), R, K)
    plan = plan_packing(valid, budget, sample_major=False)
    gt = jax.random.uniform(jax.random.PRNGKey(2), (R, 3))

    def loss_pad(s):
        out = composite_rays_train(s, rgb, dt, ts, valid, 1e-4)
        return jnp.mean((out["rgb"] - gt) ** 2) + out["opacity"].mean()

    def loss_stream(s):
        out = composite_stream_train(
            plan, pack(s.reshape(-1), plan), pack(rgb.reshape(-1, 3), plan),
            pack(dt.reshape(-1), plan), pack(ts.reshape(-1), plan),
            R, K, 1e-4)
        return jnp.mean((out["rgb"] - gt) ** 2) + out["opacity"].mean()

    g_pad = jax.grad(loss_pad)(sig)
    g_str = jax.grad(loss_stream)(sig)
    np.testing.assert_allclose(np.asarray(g_str), np.asarray(g_pad),
                               rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_stream_scattered_valid():
    """Full-capacity marcher rows have scattered (non-prefix) validity."""
    R, K, budget = 48, 12, 400
    key = jax.random.PRNGKey(3)
    valid = jax.random.bernoulli(key, 0.4, (R, K))
    sig = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), (R, K))) * 20
    rgb = jax.random.uniform(jax.random.fold_in(key, 2), (R, K, 3))
    ts = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 3), (R, K)),
                  axis=-1) + 0.1
    dt = jnp.full((R, K), 0.01)
    ref = composite_rays_train(sig, rgb, dt, ts, valid, 1e-4)
    plan = plan_packing(valid, budget, sample_major=False)
    keep2d = plan.keep.reshape(R, K)
    ray_mask = np.asarray(~jnp.any(valid & ~keep2d, axis=-1))
    got = composite_stream_train(
        plan, pack(sig.reshape(-1), plan), pack(rgb.reshape(-1, 3), plan),
        pack(dt.reshape(-1), plan), pack(ts.reshape(-1), plan), R, K, 1e-4)
    for k in ("opacity", "depth", "depth_sq", "rgb"):
        np.testing.assert_allclose(np.asarray(got[k])[ray_mask],
                                   np.asarray(ref[k])[ray_mask],
                                   rtol=2e-5, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_inf_sigma_does_not_poison_later_rays():
    """One TruncExp-overflow slot (sigma = inf) must only saturate ITS ray
    (T -> 0 downstream), never NaN later rays in the stream — regression
    for the global-cumsum carry formulation (inf - inf = NaN) that silently
    NaN'd whole training runs."""
    R, K = 8, 4
    valid = jnp.ones((R, K), bool)
    sig = jnp.full((R, K), 5.0).at[2, 1].set(jnp.inf)
    rgb = jnp.full((R, K, 3), 0.5)
    ts = jnp.tile(jnp.arange(K, dtype=jnp.float32)[None] * 0.01 + 0.1,
                  (R, 1))
    dt = jnp.full((R, K), 0.01)
    plan = plan_packing(valid, R * K, sample_major=False)
    out = composite_stream_train(
        plan, pack(sig.reshape(-1), plan), pack(rgb.reshape(-1, 3), plan),
        pack(dt.reshape(-1), plan), pack(ts.reshape(-1), plan), R, K, 1e-4)
    for k in ("opacity", "depth", "rgb", "tau"):
        assert np.isfinite(np.asarray(out[k])).all(), k
    # gradients w.r.t. sigma must be finite for every OTHER ray too
    def loss(s):
        o = composite_stream_train(
            plan, pack(s.reshape(-1), plan), pack(rgb.reshape(-1, 3), plan),
            pack(dt.reshape(-1), plan), pack(ts.reshape(-1), plan),
            R, K, 1e-4)
        mask = jnp.arange(R) != 2
        return jnp.sum(jnp.where(mask[:, None], o["rgb"], 0.0))
    g = jax.grad(loss)(sig)
    assert np.isfinite(np.asarray(g)[np.arange(R) != 2]).all(), "grad NaN"


@pytest.mark.slow
def test_empty_ray_opacity_never_negative_and_loss_finite():
    """Cancellation in the global ray-reduction cumsum could return a tiny
    NEGATIVE opacity for empty rays; -o*log(o) then NaN'd the sigma/table
    gradients (silent all-NaN params mid-training).  Lock both guards."""
    from google_nerf_tpu.train.losses import NeRFLoss
    R, K = 32, 8
    # most rays empty, a few dense rays with large optical depth to grow
    # the global cumsum
    valid = jnp.zeros((R, K), bool).at[::8].set(True)
    sig = jnp.full((R, K), 1e4)
    rgb = jnp.full((R, K, 3), 0.3)
    ts = jnp.tile(jnp.arange(K, dtype=jnp.float32)[None] * 0.01 + 0.1,
                  (R, 1))
    dt = jnp.where(valid, 0.01, 0.0)
    plan = plan_packing(valid, R * K, sample_major=False)
    out = composite_stream_train(
        plan, pack(sig.reshape(-1), plan), pack(rgb.reshape(-1, 3), plan),
        pack(dt.reshape(-1), plan), pack(ts.reshape(-1), plan), R, K, 1e-4)
    assert float(jnp.min(out["opacity"])) >= 0.0
    batch = {"rgb": jnp.full((R, 3), 0.5)}
    res = dict(out, ray_mask=jnp.ones((R,), bool))
    total, _ = NeRFLoss().total(res, batch)
    assert np.isfinite(float(total))
    # loss must also stay finite for adversarially negative opacity input
    res_bad = dict(res, opacity=jnp.full((R,), -1e-7))
    total2, _ = NeRFLoss().total(res_bad, batch)
    assert np.isfinite(float(total2))
