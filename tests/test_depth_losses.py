"""Depth loss zoo tests: semantics vs hand computations and reference math."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from google_nerf_tpu.depth.losses import (LossConfig, depth_losses,
                                          ilnr_loss, masked_mean, msgil_loss,
                                          pwn_edges_loss, pwn_planes_loss,
                                          ranking_loss,
                                          recover_scale_shift_depth,
                                          sample_masked_indices, sobel_edges)
from google_nerf_tpu.depth.normals import (box_blur_3x3, depth_to_xyz,
                                           get_surface_normal_v2,
                                           surface_normal_from_depth)

KEY = jax.random.PRNGKey(0)


def test_recover_scale_shift_exact():
    """If gt = a*pred + b on valid pixels, recovery is exact."""
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.uniform(0.5, 2.0, (2, 16, 16)).astype(np.float32))
    gt = 3.0 * pred + 0.7
    out = recover_scale_shift_depth(pred, gt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gt), rtol=1e-3)


def test_recover_scale_shift_masked():
    rng = np.random.default_rng(1)
    pred = jnp.asarray(rng.uniform(0.5, 2.0, (1, 8, 8)).astype(np.float32))
    gt = 2.0 * pred + 1.0
    gt = gt.at[0, :4].set(-1.0)  # invalid rows excluded from the fit
    out = recover_scale_shift_depth(pred, gt)
    np.testing.assert_allclose(np.asarray(out[0, 4:]),
                               np.asarray(gt[0, 4:]), rtol=1e-3)


def test_ilnr_perfect_pred_zero():
    gt = jnp.asarray(np.random.default_rng(0).uniform(
        0.1, 10.0, (2, 32, 32)).astype(np.float32))
    loss = ilnr_loss(gt, gt)
    assert float(loss) == pytest.approx(0.0, abs=1e-6)


def test_ilnr_hand_value():
    """ILNR = masked-mean |gt - pred| + masked-mean |tanh diff| per image
    (fork-degenerate normalization: gt' == gt)."""
    gt = jnp.full((1, 16, 16), 2.0)
    pred = jnp.full((1, 16, 16), 3.0)
    expect = 1.0 + abs(np.tanh(0.02) - np.tanh(0.03))
    assert float(ilnr_loss(pred, gt)) == pytest.approx(expect, rel=1e-5)


def test_ilnr_invalid_image_skipped():
    gt = jnp.stack([jnp.full((8, 8), -1.0),     # all invalid -> skipped
                    jnp.full((8, 8), 2.0)])
    # <=100 valid pixels in image 0 -> excluded from mean
    pred = jnp.ones((2, 8, 8))
    # image 1: 64 valid pixels < 100 -> also excluded -> loss 0
    assert float(ilnr_loss(pred, gt)) == 0.0


def test_msgil_zero_for_constant_offset():
    """Gradient loss ignores constant offsets."""
    gt = jnp.asarray(np.random.default_rng(0).uniform(
        0.1, 5.0, (1, 32, 32)).astype(np.float32))
    loss = msgil_loss(gt + 1.5, gt)
    assert float(jnp.sum(loss)) == pytest.approx(0.0, abs=1e-5)


def test_msgil_positive_for_gradient_mismatch():
    gt = jnp.ones((1, 32, 32))
    pred = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 32, 32)).astype(np.float32))
    assert float(jnp.sum(msgil_loss(pred, gt))) > 0.01


def test_sample_masked_indices_uniform_valid():
    mask = jnp.zeros((1024,), bool).at[100:200].set(True)
    idx, ok = sample_masked_indices(KEY, mask, 50)
    assert bool(ok.all())
    assert ((np.asarray(idx) >= 100) & (np.asarray(idx) < 200)).all()
    assert len(np.unique(np.asarray(idx))) == 50  # without replacement


def test_sobel_edges_detects_step():
    img = jnp.zeros((1, 16, 16)).at[:, :, 8:].set(1.0)
    edges, thetas = sobel_edges(img)
    e = np.asarray(edges[0])
    assert e[8, 7:9].max() > 1.0
    assert e[8, 2] == 0.0


@pytest.mark.slow
def test_ranking_loss_orders_correctly():
    """Pred that inverts gt ordering scores worse than gt-consistent pred."""
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(1.0, 5.0, (1, 32, 32)).astype(np.float32))
    rgb = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    good = ranking_loss(KEY, gt, gt, rgb, n_pairs=512)
    bad = ranking_loss(KEY, -gt, gt, rgb, n_pairs=512)
    assert float(bad.sum()) > float(good.sum())


def test_surface_normal_flat_plane():
    """Constant-depth plane -> normals along -z (after orientation)."""
    depth = jnp.full((1, 32, 32), 2.0)
    n = surface_normal_from_depth(depth, jnp.asarray([100.0]),
                                  jnp.ones((1, 32, 32), bool))
    inner = np.asarray(n[0, 8:-8, 8:-8])
    assert np.abs(inner[..., 2]).min() > 0.95


def test_depth_to_xyz_center_ray():
    depth = jnp.full((1, 9, 9), 3.0)
    xyz = depth_to_xyz(depth, jnp.asarray([50.0]))
    # principal point at w/2: pixel (4,4) has u-u0 = -0.5
    c = np.asarray(xyz[0, 4, 4])
    assert c[2] == pytest.approx(3.0)
    assert abs(c[0]) < 0.05 and abs(c[1]) < 0.05


def test_box_blur_constant():
    x = jnp.full((1, 8, 8), 4.0)
    y = box_blur_3x3(x)
    assert float(y[0, 4, 4]) == pytest.approx(4.0, rel=1e-6)
    assert float(y[0, 0, 0]) == pytest.approx(4.0 * 4 / 9, rel=1e-6)


@pytest.mark.slow
def test_pwn_edges_runs_and_zero_for_perfect():
    rng = np.random.default_rng(0)
    gt = jnp.asarray(rng.uniform(1.0, 5.0, (1, 32, 32)).astype(np.float32))
    rgb = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    f = jnp.asarray([100.0])
    same = pwn_edges_loss(KEY, gt, gt, rgb, f, n_pairs=256)
    assert float(same.sum()) == pytest.approx(0.0, abs=1e-4)
    diff = pwn_edges_loss(KEY, 1.0 / gt, gt, rgb, f, n_pairs=256)
    assert float(diff.sum()) >= float(same.sum())


@pytest.mark.slow
def test_pwn_planes_flat_plane_zero():
    """All sampled points on one plane share the normal -> loss ~ 0."""
    h = w = 32
    v = jnp.arange(h, dtype=jnp.float32)[:, None]
    depth = jnp.broadcast_to(2.0 + 0.01 * v, (1, h, w))
    planes = jnp.ones((1, h, w), jnp.int32)
    loss = pwn_planes_loss(KEY, depth, depth, planes, jnp.asarray([100.0]),
                           sample_groups=128, max_planes=2)
    assert float(loss) == pytest.approx(0.0, abs=5e-2)


@pytest.mark.slow
def test_orchestrator_modes_and_raw():
    rng = np.random.default_rng(0)
    b, h, w = 2, 32, 32
    pred = jnp.asarray(rng.uniform(0.5, 3, (b, h, w)).astype(np.float32))
    data = dict(
        depth=jnp.asarray(rng.uniform(0.5, 3, (b, h, w)).astype(np.float32)),
        rgb=jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32)),
        focal_length=jnp.asarray([100.0, 100.0]),
        quality_flg=jnp.asarray([3, 2]),
        planes=jnp.zeros((b, h, w), jnp.int32),
    )
    cfg = LossConfig(loss_mode="_ranking-edge_msgil-normal_meanstd-tanh_"
                     "_pairwise-normal-regress-edge_")
    out = depth_losses(KEY, pred, data, cfg)
    assert out["total_raw"].shape == (b,)
    assert np.isfinite(float(out["total_loss"]))
    for k in ("ranking-edge_loss", "msg_normal_loss", "meanstd-tanh_loss",
              "pairwise-normal-regress-edge_loss"):
        assert k in out, k
    # flags off -> losses absent
    out2 = depth_losses(KEY, pred, data,
                        LossConfig(loss_mode="_meanstd-tanh_"))
    assert "ranking-edge_loss" not in out2
    # jit + grad flow
    g = jax.grad(lambda p: depth_losses(KEY, p, data, cfg)["total_loss"])(
        pred)
    assert np.isfinite(np.asarray(g)).all()


def test_depth_metrics_battery():
    from google_nerf_tpu.depth.metrics import (evaluate_rel_err,
                                               recover_metric_depth)
    rng = np.random.default_rng(0)
    gt = rng.uniform(0.5, 5.0, (64, 64))
    pred = 2.0 * gt + 0.3
    fit = recover_metric_depth(pred, gt)
    np.testing.assert_allclose(fit, gt, rtol=1e-6)
    m = evaluate_rel_err(pred, gt)
    assert m["err_absRel"] == pytest.approx(0.0, abs=1e-6)
    assert m["err_delta1"] == 1.0
    assert m["err_whdr"] == pytest.approx(0.0, abs=1e-6)
    m2 = evaluate_rel_err(1.0 / gt, gt, scale_fit=False)
    assert m2["err_absRel"] > 0.1
