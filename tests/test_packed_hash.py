"""packed-corner hash encoder: forward vs naive reference, custom VJP vs
XLA autodiff of the reference, dx for pose refinement."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from google_nerf_tpu.ops.packed_hash import (PackedHashConfig,
                                             _cell_keys, _corner_weights,
                                             init_packed_hash,
                                             packed_config_for_scale,
                                             packed_hash_encode)

CFG = PackedHashConfig(n_levels=4, n_features=2, log2_table_size=10,
                       base_resolution=4, per_level_scale=2.0,
                       table_dtype="float32")
CFG_BF16 = PackedHashConfig(n_levels=4, n_features=2, log2_table_size=10,
                            base_resolution=4, per_level_scale=2.0)
KEY = jax.random.PRNGKey(0)


def ref_encode(table, x, cfg):
    """Independent naive implementation (differentiable)."""
    L, T, W = table.shape
    F = cfg.n_features
    keys, frac = _cell_keys(x, cfg)
    w = _corner_weights(frac)
    outs = []
    for l in range(L):
        rows = jnp.take(table[l], keys[l], axis=0).reshape(-1, 8, F)
        outs.append(jnp.einsum("nc,ncf->nf", w[l], rows))
    return jnp.moveaxis(jnp.stack(outs), 0, 1).reshape(x.shape[0], L * F)


@pytest.fixture(scope="module")
def setup():
    table = init_packed_hash(KEY, CFG) * 1e4  # O(1) values
    x = jax.random.uniform(jax.random.fold_in(KEY, 1), (257, 3))
    return table, x


def test_forward_matches_reference(setup):
    table, x = setup
    out = packed_hash_encode(table, x, CFG)
    ref = ref_encode(table, x, CFG)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    assert out.shape == (257, CFG.out_dim)


def test_forward_bf16_close(setup):
    table, x = setup
    out = packed_hash_encode(table, x, CFG_BF16)
    ref = ref_encode(table, x, CFG_BF16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_table_gradient_matches_autodiff(setup):
    table, x = setup
    g = jax.random.normal(jax.random.fold_in(KEY, 2),
                          (x.shape[0], CFG.out_dim))

    def loss_fused(t):
        return jnp.vdot(packed_hash_encode(t, x, CFG), g)

    def loss_ref(t):
        return jnp.vdot(ref_encode(t, x, CFG), g)

    dt_fused = jax.grad(loss_fused)(table)
    dt_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(dt_fused), np.asarray(dt_ref),
                               rtol=1e-4, atol=1e-5)


def test_x_gradient_matches_autodiff(setup):
    table, x = setup
    # keep x away from cell boundaries where trilinear grad is discontinuous
    x = jnp.clip(x, 0.01, 0.99)
    g = jax.random.normal(jax.random.fold_in(KEY, 3),
                          (x.shape[0], CFG.out_dim))

    dx_fused = jax.grad(lambda xx: jnp.vdot(
        packed_hash_encode(table, xx, CFG), g))(x)
    dx_ref = jax.grad(lambda xx: jnp.vdot(ref_encode(table, xx, CFG), g))(x)
    np.testing.assert_allclose(np.asarray(dx_fused), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_gradient_collisions_accumulate():
    """Many samples in the same cell must sum their gradients exactly."""
    cfg = PackedHashConfig(n_levels=1, n_features=2, log2_table_size=8,
                           base_resolution=2, per_level_scale=1.0,
                           table_dtype="float32")
    table = jnp.zeros((1, 256, 16))
    x = jnp.tile(jnp.asarray([[0.3, 0.3, 0.3]]), (64, 1))
    g = jnp.ones((64, 2))
    dt = jax.grad(lambda t: jnp.vdot(packed_hash_encode(t, x, cfg), g))(
        table)
    w = _corner_weights(jnp.asarray([[0.6, 0.6, 0.6]]))[0]  # frac of 0.3*2
    nz = np.asarray(dt)[0]
    assert (np.abs(nz).sum(axis=1) > 0).sum() == 1  # one cell row touched
    row = nz[np.abs(nz).sum(axis=1).argmax()].reshape(8, 2)
    np.testing.assert_allclose(row[:, 0], 64 * np.asarray(w), rtol=1e-5)


def test_config_for_scale_span():
    cfg = packed_config_for_scale(0.5, n_levels=8)
    assert cfg.resolutions[0] == 16
    assert cfg.resolutions[-1] == pytest.approx(1024, abs=2)


def test_jit_and_value_grad_compile(setup):
    table, x = setup

    @jax.jit
    def f(t, xx):
        return jnp.sum(packed_hash_encode(t, xx, CFG) ** 2)

    v, grads = jax.value_and_grad(f)(table, x)
    assert np.isfinite(float(v))
    assert np.isfinite(np.asarray(grads)).all()


def test_table_gradient_precision_at_scale():
    """The sort+cumsum+marker-merge backward must stay accurate when the
    cumulative sums span many thousands of rows (guards against
    catastrophic cancellation in the running-sum diffs)."""
    cfg = PackedHashConfig(n_levels=4, n_features=2, log2_table_size=12,
                           base_resolution=16, per_level_scale=2.0,
                           table_dtype="float32")
    key = jax.random.PRNGKey(0)
    table = init_packed_hash(key, cfg) * 1e4
    n = 16384
    x = jax.random.uniform(jax.random.fold_in(key, 1), (n, 3))
    g = jax.random.normal(jax.random.fold_in(key, 2),
                          (n, cfg.out_dim)) * 0.01

    dt = jax.grad(lambda t: jnp.vdot(packed_hash_encode(t, x, cfg), g))(
        table)

    from google_nerf_tpu.ops.packed_hash import (_cell_keys,
                                                 _corner_weights)
    keys, frac = _cell_keys(x, cfg)
    w = np.asarray(_corner_weights(frac), np.float64)
    gl = np.moveaxis(np.asarray(g, np.float64).reshape(n, cfg.n_levels, 2),
                     1, 0)
    ref = np.zeros((cfg.n_levels, cfg.table_size, 16), np.float64)
    k_np = np.asarray(keys)
    for l in range(cfg.n_levels):
        contrib = (w[l][:, :, None] * gl[l][:, None, :]).reshape(n, 16)
        np.add.at(ref[l], k_np[l], contrib)
    err = np.abs(np.asarray(dt, np.float64) - ref)
    sig = np.abs(ref) > 1e-6
    rel = err[sig] / np.abs(ref[sig])
    assert np.median(rel) < 1e-3
    assert err.max() < 1e-5
