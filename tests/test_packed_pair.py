"""Paired-level packed encoder (ops/packed_pair.py): forward golden vs the
plain restatement, custom-VJP gradients vs autodiff of the restatement,
config geometry, and NGP integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from google_nerf_tpu.ops.packed_pair import (PackedPairConfig,
                                             init_packed_pair,
                                             packed_pair_config_for_scale,
                                             packed_pair_encode,
                                             packed_pair_encode_ref)

CFG = PackedPairConfig(n_pairs=3, n_features=2, log2_table_size=10,
                       base_resolution=4, per_pair_scale=3.0,
                       table_dtype="float32")


def _data(n=257, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    table = init_packed_pair(k1, CFG) * 1e4   # O(1) values
    x = jax.random.uniform(k2, (n, 3))
    return table, x


def test_config_geometry():
    cfg = packed_pair_config_for_scale(0.5, n_pairs=4)
    assert cfg.resolutions[0] == 16
    # finest CHILD level reaches N_max = 1024
    assert abs(cfg.child_resolutions[-1] - 1024) <= 2
    assert cfg.all_resolutions == tuple(
        v for r in cfg.resolutions for v in (r, 2 * r))
    assert cfg.out_dim == 16
    assert cfg.row_width == 70


def test_forward_matches_reference():
    table, x = _data()
    out = packed_pair_encode(table, x, CFG)
    ref = packed_pair_encode_ref(table, x, CFG)
    assert out.shape == (x.shape[0], CFG.out_dim)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_boundary_positions_finite():
    table, _ = _data()
    x = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0],
                     [0.5, 0.5, 0.5], [1.0, 0.0, 0.5]])
    out = packed_pair_encode(table, x, CFG)
    ref = packed_pair_encode_ref(table, x, CFG)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_table_gradient_matches_autodiff():
    table, x = _data(101)

    def loss_vjp(t):
        y = packed_pair_encode(t, x, CFG)
        return jnp.sum(jnp.sin(y) * jnp.arange(y.shape[1]))

    def loss_ref(t):
        y = packed_pair_encode_ref(t, x, CFG)
        return jnp.sum(jnp.sin(y) * jnp.arange(y.shape[1]))

    g_vjp = jax.grad(loss_vjp)(table)
    g_ref = jax.grad(loss_ref)(table)
    # atol floor: the two-sort backward reads each row's gradient as a
    # cumsum difference — f32 cancellation noise ~1e-5 at O(10) running
    # sums (same bound as test_packed_hash)
    np.testing.assert_allclose(np.asarray(g_vjp), np.asarray(g_ref),
                               rtol=1e-4, atol=5e-5)


def test_x_gradient_matches_autodiff():
    table, x = _data(67)
    # keep samples away from cell faces where the trilerp kinks (autodiff
    # of floor() is fine on both sides but not AT the boundary)
    x = jnp.clip(x, 0.01, 0.99)

    def loss_vjp(xx):
        return jnp.sum(packed_pair_encode(table, xx, CFG) ** 2)

    def loss_ref(xx):
        return jnp.sum(packed_pair_encode_ref(table, xx, CFG) ** 2)

    g_vjp = jax.grad(loss_vjp)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_vjp), np.asarray(g_ref),
                               rtol=2e-3, atol=1e-4)


def test_child_c0_inside_parent_cell():
    """The child level is continuous across CHILD-cell faces interior to a
    parent cell (the 27-grid shares vertices) — the design's smoothness
    claim vs the packed encoder."""
    table, _ = _data()
    # pick the mid-plane of parent cell 0 at the coarsest pair (res 4):
    # parent cell [0, 1/4)^3, child face at x = 1/8
    eps = 1e-5
    a = jnp.asarray([[1.0 / 8 - eps, 0.1, 0.1]])
    b = jnp.asarray([[1.0 / 8 + eps, 0.1, 0.1]])
    ya = packed_pair_encode(table, a, CFG)
    yb = packed_pair_encode(table, b, CFG)
    # pair-0 child features are columns [F:2F]
    F = CFG.n_features
    np.testing.assert_allclose(np.asarray(ya[0, F:2 * F]),
                               np.asarray(yb[0, F:2 * F]), atol=1e-3)


def test_ngp_integration_packed2():
    from google_nerf_tpu.models.ngp import NGPConfig, init_ngp, ngp_apply
    cfg = NGPConfig(scale=0.5, encoder="packed2", packed_log2_size=10)
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    assert "pair_table" in params
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3),
                           minval=-0.5, maxval=0.5)
    d = jax.random.normal(jax.random.PRNGKey(2), (64, 3))
    sigmas, rgbs = ngp_apply(params, cfg, x, d)
    assert sigmas.shape == (64,) and rgbs.shape == (64, 3)
    assert np.isfinite(np.asarray(sigmas)).all()

    # gradients flow to the table through the full model
    def loss(p):
        s, r = ngp_apply(p, cfg, x, d)
        return jnp.mean(s) + jnp.mean(r)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["pair_table"]).sum()) > 0


@pytest.mark.parametrize("n", [1, 8, 300])
def test_shapes(n):
    table, _ = _data()
    x = jax.random.uniform(jax.random.PRNGKey(3), (n, 3))
    out = packed_pair_encode(table, x, CFG)
    assert out.shape == (n, CFG.out_dim)
