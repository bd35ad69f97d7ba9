"""LPIPS architecture golden test.

The environment has no pretrained VGG/LPIPS weights (zero egress), so the
end-to-end LPIPS *value* cannot be checked here.  What CAN be locked is the
architecture: this test builds random-init weights of the exact shapes the
converter (`tools/convert_lpips_weights.py`) emits, evaluates
`eval.metrics._lpips_impl`, and compares against an INDEPENDENT
implementation of the LPIPS-vgg graph written with torch.nn.functional
(reference semantics: `lpips.LPIPS(net='vgg')` — scaling layer, VGG16
features tapped after each block's last ReLU, channel unit-normalize,
squared diff, non-negative 1x1 linear heads, spatial average, sum over the
5 taps; used by the reference at `ngp_pl/train.py:68`).

When real weights become mountable, the documented conversion is:
  python tools/convert_lpips_weights.py --out lpips_vgg.npz
and `LPIPS(weights_path="lpips_vgg.npz")` produces calibrated scores.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from google_nerf_tpu.eval.metrics import (  # noqa: E402
    _SCALE, _SHIFT, _VGG_BLOCKS, LPIPS, _lpips_impl)


def _random_weights(rng):
    """Random-init weight dict with the exact converter shapes."""
    w = {}
    cin = 3
    li = 0
    tap_widths = []
    for widths in _VGG_BLOCKS:
        for cout in widths:
            w[f"conv{li}_w"] = rng.normal(
                0, 0.05, (cout, cin, 3, 3)).astype(np.float32)
            w[f"conv{li}_b"] = rng.normal(0, 0.05, (cout,)).astype(
                np.float32)
            cin = cout
            li += 1
        tap_widths.append(cin)
    for j, c in enumerate(tap_widths):
        # lpips lin heads are non-negative at convergence; random abs()
        w[f"lin{j}_w"] = np.abs(
            rng.normal(0, 0.05, (1, c, 1, 1))).astype(np.float32)
    return w


def _torch_vgg_features(w, x):
    """Independent re-statement of the LPIPS vgg trunk in torch."""
    x = (x - torch.tensor(_SHIFT).view(1, 3, 1, 1)) / \
        torch.tensor(_SCALE).view(1, 3, 1, 1)
    feats = []
    li = 0
    for b, widths in enumerate(_VGG_BLOCKS):
        for _ in widths:
            x = F.conv2d(x, torch.tensor(w[f"conv{li}_w"]),
                         torch.tensor(w[f"conv{li}_b"]), padding=1)
            x = F.relu(x)
            li += 1
        feats.append(x)
        if b < len(_VGG_BLOCKS) - 1:
            x = F.max_pool2d(x, 2, 2)
    return feats


def _torch_lpips(w, x_np, y_np):
    x = torch.tensor(x_np)
    y = torch.tensor(y_np)
    fx = _torch_vgg_features(w, x)
    fy = _torch_vgg_features(w, y)
    total = 0.0
    for j, (a, b) in enumerate(zip(fx, fy)):
        a = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        d = (a - b) ** 2
        lin = torch.tensor(w[f"lin{j}_w"])
        total = total + (d * lin).sum(1).mean()
    return float(total)


def test_lpips_graph_matches_independent_torch_impl():
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    w = _random_weights(rng)
    x = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    got = float(_lpips_impl({k: jnp.asarray(v) for k, v in w.items()},
                            jnp.asarray(x), jnp.asarray(y)))
    want = _torch_lpips(w, x, y)
    assert got == pytest.approx(want, rel=1e-4, abs=1e-5)


def test_lpips_identical_images_score_zero():
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    w = {k: jnp.asarray(v) for k, v in _random_weights(rng).items()}
    x = jnp.asarray(rng.uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32))
    assert float(_lpips_impl(w, x, x)) == pytest.approx(0.0, abs=1e-7)


def test_lpips_class_degrades_gracefully_without_weights():
    scorer = LPIPS(weights_path=None)
    assert not scorer.available
    assert scorer(np.zeros((8, 8, 3)), np.zeros((8, 8, 3))) is None
