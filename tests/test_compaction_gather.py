"""Tests for sample compaction and the sorted-segment table gather."""
import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.ops.compaction import pack, plan_packing, unpack
from google_nerf_tpu.ops.table_gather import table_gather


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    R, K, B = 8, 16, 128
    valid = jnp.asarray(rng.rand(R, K) > 0.5)
    x = jnp.asarray(rng.randn(R * K, 3).astype(np.float32))
    plan = plan_packing(valid, B)
    packed = pack(x, plan)
    assert packed.shape == (B, 3)
    un = unpack(packed, plan)
    flatv = np.asarray(valid).reshape(-1)
    np.testing.assert_allclose(np.asarray(un)[flatv],
                               np.asarray(x)[flatv], atol=1e-6)
    assert (np.asarray(un)[~flatv] == 0).all()


def test_pack_respects_budget():
    valid = jnp.ones((4, 8), bool)
    # sample-major (default): every ray keeps its FIRST 4 sample slots
    plan = plan_packing(valid, 16)  # 32 valid > 16 budget
    x = jnp.arange(32.0)[:, None]
    un = np.asarray(unpack(pack(x, plan), plan))[:, 0].reshape(4, 8)
    for r in range(4):
        np.testing.assert_allclose(un[r, :4], np.arange(8 * r, 8 * r + 4))
        np.testing.assert_allclose(un[r, 4:], 0.0)
    # ray-major option: first 16 flat slots survive (old semantics)
    plan_rm = plan_packing(valid, 16, sample_major=False)
    un_rm = np.asarray(unpack(pack(x, plan_rm), plan_rm))[:, 0]
    np.testing.assert_allclose(un_rm[:16], np.arange(16.0))
    np.testing.assert_allclose(un_rm[16:], 0.0)


def test_rowmajor_plan_equals_reference():
    """The sort-free ray-major plan must equal a flat-order numpy
    reference field-for-field, across budgets (under/exact/over) and
    degenerate masks (empty rows, full rows, all-empty)."""
    rng = np.random.RandomState(11)
    cases = []
    for p in (0.0, 0.3, 1.0):
        v = rng.rand(13, 17) < p
        cases.append(v)
    v = rng.rand(13, 17) < 0.4
    v[3] = False
    v[7] = True
    cases.append(v)
    for v in cases:
        R, K = v.shape
        flat_idx = np.flatnonzero(v.reshape(-1))
        for budget in (1, 8, len(flat_idx) or 1, R * K):
            plan = plan_packing(jnp.asarray(v), budget, sample_major=False)
            B = min(budget, R * K)
            src_ref = np.zeros(B, np.int64)
            sv_ref = np.zeros(B, bool)
            m = min(B, len(flat_idx))
            src_ref[:m] = flat_idx[:m]
            sv_ref[:m] = True
            pos_ref = np.full(R * K, B - 1, np.int64)
            keep_ref = np.zeros(R * K, bool)
            pos_ref[flat_idx[:m]] = np.arange(m)
            keep_ref[flat_idx[:m]] = True
            np.testing.assert_array_equal(np.asarray(plan.src_idx), src_ref)
            np.testing.assert_array_equal(np.asarray(plan.slot_valid), sv_ref)
            np.testing.assert_array_equal(np.asarray(plan.pos), pos_ref)
            np.testing.assert_array_equal(np.asarray(plan.keep), keep_ref)
            assert int(plan.n_valid) == len(flat_idx)


def test_pack_unpack_gradients_match_dense():
    """grad through pack->f->unpack == grad through masked dense eval."""
    rng = np.random.RandomState(1)
    R, K, B = 6, 10, 64
    valid = jnp.asarray(rng.rand(R, K) > 0.4)
    x = jnp.asarray(rng.randn(R * K, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3).astype(np.float32))
    plan = plan_packing(valid, B)

    def f_packed(x, w):
        y = pack(x, plan) @ w[:, None]
        out = unpack(y, plan).reshape(R, K)
        return (out * valid).sum()

    def f_dense(x, w):
        y = (x @ w[:, None]).reshape(R, K)
        return (y * valid).sum()

    g1x, g1w = jax.grad(f_packed, argnums=(0, 1))(x, w)
    g2x, g2w = jax.grad(f_dense, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(g1x), np.asarray(g2x), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1w), np.asarray(g2w), atol=1e-4)


def test_table_gather_forward_and_sorted_backward():
    rng = np.random.RandomState(2)
    M, N, F = 64, 500, 2
    table = jnp.asarray(rng.randn(M, F).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, M, N).astype(np.int32))
    cot = jnp.asarray(rng.randn(N, F).astype(np.float32))

    out = table_gather(table, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table)[idx],
                               atol=1e-6)

    def loss(t, mode):
        return (table_gather(t, idx, mode) * cot).sum()

    g_sorted = jax.grad(lambda t: loss(t, "sorted"))(table)
    g_scatter = jax.grad(lambda t: loss(t, "scatter"))(table)
    # reference: explicit accumulation
    ref = np.zeros((M, F), np.float32)
    np.add.at(ref, np.asarray(idx), np.asarray(cot))
    np.testing.assert_allclose(np.asarray(g_scatter), ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g_sorted), ref, atol=1e-4)


def test_table_gather_backward_extremes():
    # all-same index (maximum collisions) and all-unique indices
    M, F = 32, 2
    table = jnp.zeros((M, F))
    for idx in (jnp.zeros(100, jnp.int32),
                jnp.arange(32, dtype=jnp.int32)):
        cot = jnp.ones((idx.shape[0], F))
        g = jax.grad(lambda t: (table_gather(t, idx) * cot).sum())(table)
        ref = np.zeros((M, F), np.float32)
        np.add.at(ref, np.asarray(idx), np.ones((idx.shape[0], F)))
        np.testing.assert_allclose(np.asarray(g), ref, atol=1e-5)


def test_batched_table_gather_matches_scatter_reference():
    """The batched per-level fused-key sort backward must equal explicit
    per-level scatter accumulation (incl. collisions and untouched rows)."""
    from google_nerf_tpu.ops.table_gather import batched_table_gather
    rng = np.random.RandomState(5)
    L, T, M, F = 3, 32, 200, 2
    table = jnp.asarray(rng.randn(L, T, F).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, T, (L, M)).astype(np.int32))
    cot = jnp.asarray(rng.randn(L, M, F).astype(np.float32))

    out = batched_table_gather(table, idx, "float32")
    for l in range(L):
        np.testing.assert_allclose(np.asarray(out[l]),
                                   np.asarray(table)[l][np.asarray(idx[l])],
                                   atol=1e-6)

    g = jax.grad(lambda t: (batched_table_gather(t, idx, "float32")
                            * cot).sum())(table)
    ref = np.zeros((L, T, F), np.float32)
    for l in range(L):
        np.add.at(ref[l], np.asarray(idx[l]), np.asarray(cot[l]))
    np.testing.assert_allclose(np.asarray(g), ref, atol=1e-4)

    # extremes: every contribution on one row / all rows unique
    for pattern in (jnp.zeros((L, M), jnp.int32),
                    jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None],
                                     (L, T))):
        ones = jnp.ones(pattern.shape + (F,))
        g = jax.grad(lambda t: (batched_table_gather(t, pattern, "float32")
                                * ones).sum())(table)
        ref = np.zeros((L, T, F), np.float32)
        for l in range(L):
            np.add.at(ref[l], np.asarray(pattern[l]),
                      np.ones((pattern.shape[1], F), np.float32))
        np.testing.assert_allclose(np.asarray(g), ref, atol=1e-5)


def test_hash_encode_bf16_gather_close_to_f32():
    """The bf16 default gather path must stay within quantization noise of
    the f32 path (values O(1))."""
    from google_nerf_tpu.models.encoders import (hashgrid_config_for_scale,
                                                 hash_encode, init_hashgrid)
    cfg32 = hashgrid_config_for_scale(0.5, num_levels=4,
                                      log2_hashmap_size=10,
                                      table_dtype="float32")
    cfg16 = hashgrid_config_for_scale(0.5, num_levels=4,
                                      log2_hashmap_size=10)
    table = init_hashgrid(jax.random.PRNGKey(0), cfg32) * 1e4  # ~U(-1,1)
    x = jnp.asarray(np.random.RandomState(7).rand(64, 3), jnp.float32)
    a = np.asarray(hash_encode(table, x, cfg32))
    b = np.asarray(hash_encode(table, x, cfg16))
    assert np.abs(a - b).max() < 1e-2
    assert np.abs(a - b).mean() < 2e-3


def test_hash_encode_grads_unchanged_after_rewrite():
    """The fused-gather hash encode must produce identical grads to a naive
    per-corner implementation (checked against numeric finite differences
    on a small table)."""
    from google_nerf_tpu.models.encoders import (hashgrid_config_for_scale,
                                                 hash_encode, init_hashgrid)
    # f32 gathers for the finite-difference check: the bf16 default
    # quantizes the forward below the eps=1e-3 probe's resolution
    cfg = hashgrid_config_for_scale(0.5, num_levels=2, log2_hashmap_size=8,
                                    table_dtype="float32")
    table = init_hashgrid(jax.random.PRNGKey(0), cfg) * 1e4  # ~U(-1,1)
    x = jnp.asarray(np.random.RandomState(3).rand(5, 3), jnp.float32)

    def f(t):
        return (hash_encode(t, x, cfg) ** 2).sum()

    g = jax.grad(f)(table)
    # numeric check on a few entries touched by the gather
    touched = np.argwhere(np.asarray(jnp.abs(g[0]).sum(-1)) > 0)[:3, 0]
    eps = 1e-3
    for t_i in touched:
        pert = table.at[0, t_i, 0].add(eps)
        pert2 = table.at[0, t_i, 0].add(-eps)
        num = (f(pert) - f(pert2)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[0, t_i, 0]), num,
                                   rtol=2e-2, atol=1e-3)
