"""Depth (LeReS) model tests: shapes, cIMLE injection, weight porting."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from google_nerf_tpu.depth.backbones import LateralEncoder, lateral_channels
from google_nerf_tpu.depth.decoder import upsample_bilinear
from google_nerf_tpu.depth.model import (DepthModelConfig, DepthNet,
                                         depth_inference, init_depth_model,
                                         normalize_rgb, set_mean_var_shifts)


def test_lateral_channels():
    assert lateral_channels("resnet18") == (64, 128, 256, 512)
    assert lateral_channels("resnet50") == (256, 512, 1024, 2048)
    assert lateral_channels("resnext101_stride32x8d") == (256, 512, 1024,
                                                          2048)


def test_encoder_lateral_shapes():
    enc = LateralEncoder("resnet18")
    x = jnp.zeros((1, 64, 64, 3))
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 256), (1, 2, 2, 512)]


@pytest.mark.slow
def test_depthnet_full_resolution_output():
    cfg = DepthModelConfig(backbone="resnet18")
    variables = init_depth_model(jax.random.PRNGKey(0), cfg, (64, 64))
    logit = DepthNet(cfg).apply(variables, jnp.zeros((2, 64, 64, 3)))
    assert logit.shape == (2, 64, 64, 1)


@pytest.mark.slow
def test_depth_inference_positive():
    """RelDepthModel.inference: depth - min + 0.01 > 0
    (multi_depth_model_woauxi.py:16-21)."""
    cfg = DepthModelConfig(backbone="resnet18")
    variables = init_depth_model(jax.random.PRNGKey(0), cfg, (32, 32))
    rgb01 = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
    d = depth_inference(variables, cfg, rgb01)
    assert float(d.min()) == pytest.approx(0.01, abs=1e-5)


@pytest.mark.slow
def test_cimle_z_changes_output():
    cfg = DepthModelConfig(backbone="resnet18", d_latent=8)
    variables = init_depth_model(jax.random.PRNGKey(0), cfg, (32, 32))
    rgb = normalize_rgb(jax.random.uniform(jax.random.PRNGKey(1),
                                           (1, 32, 32, 3)))
    model = DepthNet(cfg)
    z0 = jnp.zeros((1, 8))
    z1 = jnp.ones((1, 8)) * 2.0
    d0 = model.apply(variables, rgb, z=z0)
    d1 = model.apply(variables, rgb, z=z1)
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    assert "adain_stats" in variables


def test_adain_mean_var_shifts_applied():
    cfg = DepthModelConfig(backbone="resnet18", d_latent=8)
    variables = init_depth_model(jax.random.PRNGKey(0), cfg, (32, 32))
    rgb = jnp.ones((1, 32, 32, 3))
    z = jnp.zeros((1, 8))
    model = DepthNet(cfg)
    base = model.apply(variables, rgb, z=z)
    import flax
    flat = flax.traverse_util.flatten_dict(variables["adain_stats"])
    sites = sorted({k[:-1] for k in flat})
    means = [np.full(flat[s + ("mean_shift",)].shape, 0.5) for s in sites]
    vars_ = [np.zeros(flat[s + ("var_shift",)].shape) for s in sites]
    shifted = set_mean_var_shifts(variables, means, vars_)
    out = model.apply(shifted, rgb, z=z)
    assert not np.allclose(np.asarray(base), np.asarray(out))


@pytest.mark.slow
def test_auxi_branch_shapes():
    cfg = DepthModelConfig(backbone="resnet18", with_auxi=True)
    variables = init_depth_model(jax.random.PRNGKey(0), cfg, (64, 64))
    logit, auxi = DepthNet(cfg).apply(variables, jnp.zeros((1, 64, 64, 3)))
    assert logit.shape == (1, 64, 64, 1)
    assert auxi.shape == (1, 64, 64, 1)


def test_upsample_bilinear_matches_torch_align_corners():
    """Golden check vs torch F.interpolate(align_corners=True)."""
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(1, 5, 7, 3)).astype(np.float32)
    ours = np.asarray(upsample_bilinear(jnp.asarray(x), 2))
    theirs = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
        mode="bilinear", align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_weight_conversion_resnet18_torchvision_names():
    """Converter maps torchvision/LeReS key names onto the flax tree."""
    from google_nerf_tpu.depth.weights import (convert_torch_state_dict,
                                               merge_converted,
                                               validate_against)
    cfg = DepthModelConfig(backbone="resnet18")
    variables = init_depth_model(jax.random.PRNGKey(0), cfg, (64, 64))

    # build a torch-style state dict with the right names + shapes by
    # walking the flax tree through the inverse naming convention
    import flax
    state = {}
    flat = flax.traverse_util.flatten_dict(variables["params"])
    stats = flax.traverse_util.flatten_dict(variables["batch_stats"])

    def torch_name(path):
        root, rest = path[0], path[1:]
        if root == "encoder":
            if rest[0] == "conv1":
                return "encoder_modules.conv1"
            if rest[0] == "bn1":
                return "encoder_modules.bn1"
            stage_blk = rest[0]          # layerL_B
            stage, blk = stage_blk.replace("layer", "").split("_")
            sub = rest[1]                # ConvBN_N
            n = int(sub.split("_")[1])
            leaf = rest[2]               # Conv_0 | BatchNorm_0
            if n == 3:
                mod = "downsample.0" if leaf == "Conv_0" else "downsample.1"
            else:
                mod = f"conv{n+1}" if leaf == "Conv_0" else f"bn{n+1}"
            return f"encoder_modules.layer{stage}.{blk}.{mod}"
        # decoder
        ftb_inv = {"conv1": "conv1", "branch_conv1": "conv_branch.1",
                   "branch_bn": "conv_branch.2",
                   "branch_conv2": "conv_branch.4"}
        ao_inv = {"conv1": "adapt_conv.0", "bn": "adapt_conv.1",
                  "conv2": "adapt_conv.3"}
        if rest[0] == "conv1":
            return "decoder_modules.conv1"
        if rest[0] == "conv":
            return f"decoder_modules.conv.{ftb_inv[rest[1]]}"
        if rest[0] in ("ffm0", "ffm1", "ffm2"):
            return (f"decoder_modules.{rest[0]}.{rest[1]}."
                    f"{ftb_inv[rest[2]]}")
        if rest[0] == "outconv":
            return f"decoder_modules.outconv.{ao_inv[rest[1]]}"
        raise KeyError(path)

    rng = np.random.default_rng(0)
    for path, v in flat.items():
        name = torch_name(path[:-1])
        if path[-1] == "kernel":
            state[name + ".weight"] = (0.05 * rng.normal(
                size=(v.shape[3], v.shape[2], v.shape[0], v.shape[1]))
            ).astype(np.float32)
        elif path[-1] == "bias":
            state[name + ".bias"] = rng.normal(size=v.shape).astype(
                np.float32)
        elif path[-1] == "scale":
            state[name + ".weight"] = (0.1 * np.abs(
                rng.normal(size=v.shape)) + 0.5).astype(np.float32)
    for path, v in stats.items():
        name = torch_name(path[:-1])
        leaf = {"mean": "running_mean", "var": "running_var"}[path[-1]]
        val = rng.normal(size=v.shape).astype(np.float32)
        if path[-1] == "var":
            val = np.abs(val) + 0.1  # variances must be positive
        state[name + "." + leaf] = val

    converted, skipped = convert_torch_state_dict(state)
    assert not skipped, skipped[:5]
    problems = validate_against(variables, converted)
    assert not problems, problems[:5]

    merged = merge_converted(variables, converted)
    out = DepthNet(cfg).apply(merged, jnp.zeros((1, 64, 64, 3)))
    assert np.isfinite(np.asarray(out)).all()


def test_cimle_decoder_site():
    """--cimle_version v3..v6 puts the AdaIN injection in the decoder
    (`Train/lib/models/network_auxi.py:319-566` variants)."""
    cfg = DepthModelConfig(backbone="resnet18", d_latent=8,
                           cimle_site="decoder")
    variables = init_depth_model(jax.random.PRNGKey(0), cfg, (32, 32))
    m = DepthNet(cfg)
    rgb = jnp.ones((1, 32, 32, 3))
    d0 = m.apply(variables, rgb, z=jnp.zeros((1, 8)))
    d1 = m.apply(variables, rgb, z=jnp.ones((1, 8)) * 2)
    assert d0.shape == (1, 32, 32, 1)
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    # style params live under the decoder, not the encoder
    import flax
    flat = flax.traverse_util.flatten_dict(variables["params"])
    style_keys = [k for k in flat if any("style" in str(p) for p in k)]
    assert style_keys and all(k[0] == "decoder" for k in style_keys)
