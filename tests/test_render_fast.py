"""Fast bucket-compaction test renderer == reference-path test renderer."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from google_nerf_tpu.data.synthetic import SyntheticDataset
from google_nerf_tpu.models.ngp import NGPConfig, init_ngp
from google_nerf_tpu.models.render_test_fast import render_test_fast
from google_nerf_tpu.models.rendering import render_test
from google_nerf_tpu.ops.grid import pack_occupancy_u8
from google_nerf_tpu.ops.march_seg import required_dilation_radius


@pytest.fixture(scope="module")
def scene():
    cfg = NGPConfig(scale=0.5, encoder="packed", packed_levels=2,
                    packed_log2_size=8, grid_size=16,
                    compute_dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    params = init_ngp(key, cfg)
    # non-trivial field: bias the sigma head so some density exists
    params["packed_table"] = params["packed_table"] * 1e4
    occ = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.3,
                               (1, 16, 16, 16))
    occ_u8 = pack_occupancy_u8(occ, required_dilation_radius(8, 16, 256,
                                                             0.5))
    ds = SyntheticDataset(split="test", n_images=1, img_wh=(24, 24))
    from google_nerf_tpu.core.rays import get_rays
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    return cfg, params, occ, occ_u8, o, d


def test_fast_matches_reference_renderer(scene):
    cfg, params, occ, occ_u8, o, d = scene
    ref = render_test(params, cfg, occ, o, d, T_threshold=1e-4,
                      chunk=o.shape[0], max_samples=256, n_cand=64,
                      k_samples=16)
    fast = render_test_fast(params, cfg, occ_u8, o, d, T_threshold=1e-4,
                            chunk=o.shape[0], bucket=128, k=16, seg=8,
                            n_segs=8, n_keep=8, max_samples=256)
    np.testing.assert_allclose(np.asarray(fast["opacity"]),
                               np.asarray(ref["opacity"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(fast["rgb"]),
                               np.asarray(ref["rgb"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(fast["depth"]),
                               np.asarray(ref["depth"]), atol=5e-3)


def test_fast_handles_all_dead_rays(scene):
    cfg, params, occ, occ_u8, o, d = scene
    # rays pointing away from the box -> no hits, all background
    out = render_test_fast(params, cfg, occ_u8, o + 5.0, d,
                           chunk=o.shape[0], bucket=128, k=16, seg=8,
                           n_segs=8, n_keep=4, max_samples=256)
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["opacity"]), 0.0, atol=1e-6)


@pytest.mark.slow
def test_fast_on_trained_tiny_scene():
    """End-to-end: fast renderer reproduces gt on a quickly-trained scene."""
    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.eval.metrics import psnr
    from google_nerf_tpu.train.system import (TrainConfig, init_train_state,
                                              run_training)
    model = NGPConfig(scale=0.5, encoder="packed", packed_levels=4,
                      packed_log2_size=12, grid_size=32,
                      compute_dtype=jnp.float32)
    cfg = TrainConfig(model=model, batch_size=2048, k_samples=48,
                      max_samples=256, lr=1e-2, num_epochs=1,
                      steps_per_epoch=300, warmup_steps=64)
    ds = SyntheticDataset(split="train", n_images=16, img_wh=(32, 32))
    state = init_train_state(jax.random.PRNGKey(0), cfg, ds.K, ds.poses,
                             ds.img_wh)
    state, metrics = run_training(state, ds.scene(), cfg, steps=300)
    assert float(metrics["psnr"]) > 20, float(metrics["psnr"])

    test_ds = SyntheticDataset(split="test", n_images=1, img_wh=(32, 32))
    o, d = get_rays(jnp.asarray(test_ds.directions),
                    jnp.asarray(test_ds.poses[0]))
    out = render_test_fast(state["params"], cfg.model, state["occ_u8"],
                           o, d, chunk=o.shape[0], bucket=256, k=16,
                           seg=8, n_segs=8, n_keep=8, max_samples=256)
    p = float(psnr(out["rgb"], jnp.asarray(test_ds.rays[0])))
    assert p > 19, p
