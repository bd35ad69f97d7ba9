"""Golden-value tests for SSIM / LPIPS machinery (VERDICT item 6).

SSIM is checked against an independent pure-numpy implementation of the
torchmetrics algorithm (gaussian 11x11 sigma 1.5, valid padding,
data_range=1).  LPIPS is checked structurally (converter layout) and
behaviourally (zero on identical inputs, symmetric, monotone in noise)
with random-but-valid weights, since no pretrained checkpoint ships in
this environment.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from google_nerf_tpu.eval.metrics import LPIPS, _lpips_impl, psnr, ssim


def _np_gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size) - (size - 1) / 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


def _np_filter_valid(img, kern):
    """img: (H, W); valid-mode 2D correlation, straightforward loops."""
    k = kern.shape[0]
    h, w = img.shape
    out = np.zeros((h - k + 1, w - k + 1))
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            out[i, j] = (img[i:i + k, j:j + k] * kern).sum()
    return out


def _np_ssim(pred, gt, data_range=1.0):
    """Independent reference (torchmetrics semantics)."""
    kern = _np_gaussian_kernel()
    c1, c2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    vals = []
    for c in range(pred.shape[-1]):
        x, y = pred[..., c], gt[..., c]
        mx = _np_filter_valid(x, kern)
        my = _np_filter_valid(y, kern)
        sx = _np_filter_valid(x * x, kern) - mx * mx
        sy = _np_filter_valid(y * y, kern) - my * my
        sxy = _np_filter_valid(x * y, kern) - mx * my
        s = ((2 * mx * my + c1) * (2 * sxy + c2)) / \
            ((mx ** 2 + my ** 2 + c1) * (sx + sy + c2))
        vals.append(s.mean())
    return float(np.mean(vals))


def test_ssim_matches_independent_reference():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
    pred = np.clip(gt + rng.normal(0, 0.1, gt.shape), 0, 1).astype(
        np.float32)
    ours = float(ssim(jnp.asarray(pred), jnp.asarray(gt)))
    ref = _np_ssim(pred, gt)
    assert ours == pytest.approx(ref, abs=2e-4)


def test_ssim_identity_and_ordering():
    rng = np.random.default_rng(1)
    gt = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert float(ssim(jnp.asarray(gt), jnp.asarray(gt))) == pytest.approx(
        1.0, abs=1e-5)
    near = np.clip(gt + rng.normal(0, 0.02, gt.shape), 0, 1).astype(
        np.float32)
    far = np.clip(gt + rng.normal(0, 0.3, gt.shape), 0, 1).astype(
        np.float32)
    assert float(ssim(jnp.asarray(near), jnp.asarray(gt))) > \
        float(ssim(jnp.asarray(far), jnp.asarray(gt)))


def test_psnr_known_value():
    gt = np.zeros((8, 8, 3), np.float32)
    pred = np.full((8, 8, 3), 0.1, np.float32)
    assert float(psnr(jnp.asarray(pred), jnp.asarray(gt))) == pytest.approx(
        20.0, abs=1e-4)


def _random_lpips_weights(rng):
    widths = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    w, cin = {}, 3
    for i, cout in enumerate(widths):
        w[f"conv{i}_w"] = jnp.asarray(
            rng.normal(0, (2.0 / (9 * cin)) ** 0.5,
                       (cout, cin, 3, 3)).astype(np.float32))
        w[f"conv{i}_b"] = jnp.zeros((cout,))
        cin = cout
    for j, c in enumerate((64, 128, 256, 512, 512)):
        w[f"lin{j}_w"] = jnp.asarray(
            np.abs(rng.normal(0, 1, (1, c, 1, 1))).astype(np.float32))
    return w


def test_lpips_behavior_with_random_weights():
    rng = np.random.default_rng(0)
    weights = _random_lpips_weights(rng)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1).astype(
        np.float32)
    scorer = LPIPS()
    scorer.weights = weights
    same = float(scorer(img, img))
    diff = float(scorer(img, noisy))
    sym = float(scorer(noisy, img))
    assert same == pytest.approx(0.0, abs=1e-6)
    assert diff > 1e-4
    assert diff == pytest.approx(sym, rel=1e-5)


def test_lpips_converter_layout():
    """tools/convert_lpips_weights maps both lpips-package and torchvision
    key namings onto the npz layout, and validates completeness."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "convert_lpips_weights",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "convert_lpips_weights.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    rng = np.random.default_rng(0)
    widths = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    # lpips-package style keys (global torchvision indices inside slices)
    state = {}
    cin = 3
    slice_of = lambda idx: 1 + sum(idx >= b for b in (4, 9, 16, 23))
    for conv_i, idx in enumerate(mod._VGG16_CONV_IDX):
        state[f"net.slice{slice_of(idx)}.{idx}.weight"] = rng.normal(
            size=(widths[conv_i], cin, 3, 3)).astype(np.float32)
        state[f"net.slice{slice_of(idx)}.{idx}.bias"] = np.zeros(
            widths[conv_i], np.float32)
        cin = widths[conv_i]
    for j, c in enumerate((64, 128, 256, 512, 512)):
        state[f"lin{j}.model.1.weight"] = rng.normal(
            size=(1, c, 1, 1)).astype(np.float32)
    out = mod.convert_state_dict(state)
    assert not mod.validate(out)
    # torchvision-style naming too
    state2 = {k.split(".", 2)[-1] if k.startswith("net.slice") else k: v
              for k, v in state.items()}
    state2 = {("features." + k if k[0].isdigit() else k): v
              for k, v in state2.items()}
    out2 = mod.convert_state_dict(state2)
    assert not mod.validate(out2)
    np.testing.assert_allclose(out["conv5_w"], out2["conv5_w"])

    # converted weights actually run through the LPIPS scorer
    scorer = LPIPS()
    scorer.weights = {k: jnp.asarray(v) for k, v in out.items()}
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    assert float(scorer(img, img)) == pytest.approx(0.0, abs=1e-6)
