"""Tests for encoders and the NGP model."""
import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.models.encoders import (frequency_encode,
                                             hashgrid_config_for_scale,
                                             hash_encode, init_hashgrid,
                                             sh_encode_deg4)
from google_nerf_tpu.models.mlp import init_mlp, mlp_apply
from google_nerf_tpu.models.ngp import NGPConfig, init_ngp, ngp_apply, \
    ngp_density


def test_frequency_encode_golden():
    x = jnp.array([[0.25, 0.0, 1.0]])
    enc = np.asarray(frequency_encode(x, n_freqs=2))
    assert enc.shape == (1, 12)
    # dim0: sin(pi/4), sin(pi/2), cos(pi/4), cos(pi/2)
    np.testing.assert_allclose(
        enc[0, :4],
        [np.sin(np.pi / 4), np.sin(np.pi / 2),
         np.cos(np.pi / 4), np.cos(np.pi / 2)], atol=1e-6)


def test_sh_deg4_orthonormal():
    """Monte-Carlo check: int(Y_i Y_j dOmega) ~= delta_ij."""
    rng = np.random.RandomState(0)
    d = rng.randn(200000, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    Y = np.asarray(sh_encode_deg4(jnp.asarray(d, jnp.float32)))
    G = (Y.T @ Y) / len(d) * 4 * np.pi
    np.testing.assert_allclose(G, np.eye(16), atol=0.05)


def test_hashgrid_config_matches_reference_formula():
    cfg = hashgrid_config_for_scale(0.5, num_levels=16)
    # b = exp(ln(2048*0.5/16)/15) = 64^(1/15)
    np.testing.assert_allclose(cfg.per_level_scale, 64.0 ** (1 / 15),
                               rtol=1e-6)
    assert cfg.resolutions[0] == 16
    assert cfg.resolutions[-1] == int(16 * 64 ** (1 / 15) ** 15 * (1 - 1e-9)) \
        or cfg.resolutions[-1] in (1023, 1024)


def test_hash_encode_interpolates():
    cfg = hashgrid_config_for_scale(0.5, num_levels=4,
                                    log2_hashmap_size=10)
    table = init_hashgrid(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(1).rand(64, 3), jnp.float32)
    out = hash_encode(table, x, cfg)
    assert out.shape == (64, cfg.out_dim)
    assert np.isfinite(np.asarray(out)).all()
    # continuity: a tiny perturbation produces a tiny output change
    out2 = hash_encode(table, x + 1e-5, cfg)
    assert np.abs(np.asarray(out2 - out)).max() < 1e-4
    # gradient reaches the table (scatter-add of gather VJP)
    g = jax.grad(lambda t: hash_encode(t, x, cfg).sum())(table)
    assert float(jnp.abs(g).sum()) > 0


def test_hash_encode_dense_levels_are_collision_free():
    cfg = hashgrid_config_for_scale(0.5, num_levels=2, log2_hashmap_size=19)
    # level 0 res=16 -> 17^3 = 4913 < 2^19: dense. Distinct cells must read
    # distinct table entries: vertex features at exact integers round-trip.
    table = init_hashgrid(jax.random.PRNGKey(0), cfg)
    res = cfg.resolutions[0]
    coords = np.stack(np.meshgrid(*([np.arange(4)] * 3), indexing="ij"),
                      -1).reshape(-1, 3)
    x = jnp.asarray(coords / res, jnp.float32)  # exact vertices
    out = np.asarray(hash_encode(table, x, cfg))[:, :cfg.n_features]
    tab = np.asarray(table[0])
    res1 = res + 1
    idx = coords[:, 0] + coords[:, 1] * res1 + coords[:, 2] * res1 ** 2
    np.testing.assert_allclose(out, tab[idx], atol=1e-6)


def test_mlp_shapes_and_bias_free():
    ws = init_mlp(jax.random.PRNGKey(0), [32, 64, 64, 3])
    assert [w.shape for w in ws] == [(32, 64), (64, 64), (64, 3)]
    x = jnp.zeros((5, 32))
    np.testing.assert_allclose(mlp_apply(ws, x), 0.0)  # no bias -> 0 at 0


def test_ngp_forward_shapes_and_ranges():
    for enc in ("hash", "freq"):
        cfg = NGPConfig(scale=0.5, encoder=enc, num_levels=4,
                        log2_hashmap_size=12)
        params = init_ngp(jax.random.PRNGKey(0), cfg)
        x = jnp.asarray(np.random.RandomState(0).uniform(-0.5, 0.5, (17, 3)),
                        jnp.float32)
        d = jnp.asarray(np.random.RandomState(1).randn(17, 3), jnp.float32)
        sig, rgb = ngp_apply(params, cfg, x, d)
        assert sig.shape == (17,) and rgb.shape == (17, 3)
        assert (np.asarray(sig) > 0).all()
        assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
        sig2 = ngp_density(params, cfg, x)
        np.testing.assert_allclose(sig, sig2, rtol=1e-5)


def test_ngp_cascades():
    assert NGPConfig(scale=0.5).cascades == 1
    assert NGPConfig(scale=1.0).cascades == 2
    assert NGPConfig(scale=4.0).cascades == 4
    assert NGPConfig(scale=0.25).cascades == 1


def test_ngp_grads_flow():
    cfg = NGPConfig(scale=0.5, encoder="hash", num_levels=2,
                    log2_hashmap_size=10)
    params = init_ngp(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).uniform(-.4, .4, (8, 3)),
                    jnp.float32)
    d = jnp.ones((8, 3))

    def loss(p):
        s, c = ngp_apply(p, cfg, x, d)
        return (s.sum() + c.sum())

    g = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(a)).all() for a in flat)
    assert float(jnp.abs(g["hash_table"]).sum()) > 0
    assert float(sum(jnp.abs(w).sum() for w in g["rgb_mlp"])) > 0
