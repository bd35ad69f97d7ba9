"""Tests for the truncation-backfill supervision mode and the encoder-table
weight decay (fog-control mechanisms; see DESIGN_NOTES.md).

Reference context: the reference never truncates a ray's march
(`ngp_pl/models/rendering.py:71-101` marches until T<thresh or t2), so it
has no analog — these are TPU-framework additions that keep the padded-
capacity march unbiased.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from google_nerf_tpu.data.synthetic import SyntheticDataset
from google_nerf_tpu.core.rays import get_rays
from google_nerf_tpu.models.ngp import NGPConfig, init_ngp
from google_nerf_tpu.models.rendering import render_train
from google_nerf_tpu.ops.grid import pack_occupancy_u8
from google_nerf_tpu.ops.march_seg import (march_rays_train_seg,
                                           required_dilation_radius)
from google_nerf_tpu.ops.ray_aabb import clamp_near, ray_aabb_intersect
from google_nerf_tpu.train.system import (TrainConfig, init_train_state,
                                          make_optimizer)


@pytest.fixture(scope="module")
def tiny():
    cfg = NGPConfig(scale=0.5, encoder="packed", grid_size=32,
                    packed_log2_size=12, packed_levels=4)
    ds = SyntheticDataset(split="train", n_images=2, img_wh=(16, 16))
    key = jax.random.PRNGKey(0)
    params = init_ngp(key, cfg)
    dirs = jnp.asarray(ds.directions)
    o, d = get_rays(dirs, jnp.asarray(ds.poses[0]))
    gt = jnp.asarray(ds.rays[0])
    # fully-occupied grid -> every ray is truncated at tiny k_samples
    occ = jnp.ones((cfg.cascades,) + (cfg.grid_size,) * 3, bool)
    occ_u8 = pack_occupancy_u8(
        occ, required_dilation_radius(8, cfg.grid_size, 256, cfg.scale),
        super_radius=required_dilation_radius(32, cfg.grid_size, 256,
                                              cfg.scale))
    return cfg, params, o, d, gt, occ, occ_u8


def _render(tiny, mode, gt_target):
    cfg, params, o, d, gt, occ, occ_u8 = tiny
    return render_train(params, cfg, occ, o, d, jax.random.PRNGKey(1),
                        k_samples=4, max_samples=256, occ_u8=occ_u8,
                        seg=8, n_keep=2, sup=4, n_keep_sup=2,
                        exclude_incomplete=mode, backfill_rgb=gt_target)


def test_backfill_composites_residual_onto_gt(tiny):
    cfg, params, o, d, gt, occ, occ_u8 = tiny
    out_none = _render(tiny, "none", gt)
    out_fill = _render(tiny, "backfill", gt)
    # same key -> identical march; recover which rays were truncated
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    hits = clamp_near(ray_aabb_intersect(o, d / norm, jnp.zeros(3),
                                         jnp.full((3,), cfg.scale)), 0.05)
    noise = jax.random.uniform(jax.random.PRNGKey(1), (o.shape[0],))
    m = march_rays_train_seg(o, d / norm, hits, occ_u8,
                             cascades=cfg.cascades, scale=cfg.scale,
                             grid_size=cfg.grid_size, max_samples=256,
                             k_samples=4, noise=noise, seg=8, n_keep=2,
                             sup=4, n_keep_sup=2)
    op = out_none["opacity"]
    fill = np.asarray(m["truncated"] & (op < 1.0 - 1e-4))
    assert fill.any(), "fixture must exercise the truncated path"
    prefix = out_none["rgb"] - (1.0 - op[:, None])       # white-bg removed
    expect = prefix + (1.0 - op[:, None]) * gt
    np.testing.assert_allclose(np.asarray(out_fill["rgb"])[fill],
                               np.asarray(expect)[fill], atol=1e-5)
    # non-filled rays keep the normal background composite
    np.testing.assert_allclose(np.asarray(out_fill["rgb"])[~fill],
                               np.asarray(out_none["rgb"])[~fill], atol=1e-5)
    # and no rays are dropped (that is the point vs exclusion)
    assert bool(jnp.all(out_fill["ray_mask"]))


def test_backfill_zero_loss_zero_table_grad_on_empty_prefix(tiny):
    """A truncated, unconverged ray whose prefix renders (almost) nothing
    must contribute (almost) no gradient — backfill removes the pressure to
    invent content that exclusion/none modes mishandle."""
    cfg, params, o, d, gt, occ, occ_u8 = tiny
    # force an empty prefix: sigma-scale ~ trunc_exp(0) = 1 with tiny dt
    # -> per-sample alpha ~ dt ~ 0.007; opacity ~ 4*dt
    def loss_fn(p):
        out = render_train(p, cfg, occ, o, d, jax.random.PRNGKey(1),
                           k_samples=4, max_samples=256, occ_u8=occ_u8,
                           seg=8, n_keep=2, sup=4, n_keep_sup=2,
                           exclude_incomplete="backfill", backfill_rgb=gt)
        return jnp.mean((out["rgb"] - gt) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    # prefix contributes alpha ~ 1-exp(-4*dt) ~ 0.03 -> loss ~ (0.03*|f-gt|)^2
    assert float(loss) < 1e-3
    gnorm = float(jnp.linalg.norm(grads["packed_table"]))
    assert gnorm < 1.0   # vs O(100) for mode="none" on the same fixture


def test_weight_decay_hits_table_only():
    cfg = TrainConfig(model=NGPConfig(scale=0.5, encoder="packed",
                                      grid_size=16, packed_log2_size=10),
                      weight_decay=1e-2)
    ds = SyntheticDataset(split="train", n_images=1, img_wh=(8, 8))
    st = init_train_state(jax.random.PRNGKey(0), cfg, ds.K, ds.poses,
                          ds.img_wh)
    params = st["params"]
    tx = make_optimizer(cfg)
    zero_g = jax.tree.map(jnp.zeros_like, params)
    upd, _ = tx.update(zero_g, st["opt_state"], params)
    new = jax.tree.map(lambda p, u: p + u, params, upd)
    # table decays toward 0; MLPs untouched by decay (zero grad -> zero upd)
    assert float(jnp.abs(new["packed_table"]).sum()) \
        < float(jnp.abs(params["packed_table"]).sum())
    for k in ("sigma_mlp", "rgb_mlp"):
        ref, got = jax.tree.flatten(params[k])[0], jax.tree.flatten(new[k])[0]
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
