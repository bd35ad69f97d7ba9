"""End-to-end smoke test: the framework must fit a tiny analytic scene to
high PSNR in a few hundred steps (SURVEY.md §4 'implication for the TPU
build')."""
import jax
import pytest as _pytest

pytestmark = _pytest.mark.slow  # module fixture trains 400 steps (~25 min
                                # on this CPU); every test here shares it
import jax.numpy as jnp
import numpy as np
import pytest

from google_nerf_tpu.core.rays import get_rays
from google_nerf_tpu.data.synthetic import SyntheticDataset
from google_nerf_tpu.models.ngp import NGPConfig
from google_nerf_tpu.models.rendering import render_test
from google_nerf_tpu.train.system import (TrainConfig, init_train_state,
                                          run_training)


def _tiny_cfg():
    model = NGPConfig(scale=0.5, encoder="hash", num_levels=8,
                      log2_hashmap_size=15, grid_size=32)
    return TrainConfig(model=model, batch_size=2048, k_samples=48,
                       max_samples=256, lr=1e-2, num_epochs=1,
                       steps_per_epoch=400, warmup_steps=64)


@pytest.fixture(scope="module")
def trained():
    ds = SyntheticDataset(split="train", n_images=24, img_wh=(48, 48))
    cfg = _tiny_cfg()
    state = init_train_state(jax.random.PRNGKey(0), cfg, ds.K, ds.poses,
                             ds.img_wh)
    scene = ds.scene()
    state, metrics = run_training(state, scene, cfg, steps=400)
    return ds, cfg, state, metrics


def test_training_converges(trained):
    ds, cfg, state, metrics = trained
    psnr = float(metrics["psnr"])
    assert np.isfinite(float(metrics["loss"]))
    assert psnr > 24.0, f"train psnr too low: {psnr}"
    # occupancy grid must have pruned most of the volume
    occ_frac = float(jnp.mean(state["occ"].astype(jnp.float32)))
    assert 0.001 < occ_frac < 0.5, occ_frac


def test_test_renderer_matches_gt(trained):
    ds, cfg, state, _ = trained
    test_ds = SyntheticDataset(split="test", n_images=2, img_wh=(48, 48))
    psnrs = []
    for i in range(2):
        o, d = get_rays(jnp.asarray(test_ds.directions),
                        jnp.asarray(test_ds.poses[i]))
        out = render_test(state["params"], cfg.model, state["occ"], o, d,
                          chunk=48 * 48, max_samples=cfg.max_samples,
                          n_cand=64, k_samples=16)
        mse = float(jnp.mean((out["rgb"] - test_ds.rays[i]) ** 2))
        psnrs.append(-10 * np.log10(mse))
    assert min(psnrs) > 22.0, psnrs


def test_depth_output_reasonable(trained):
    ds, cfg, state, _ = trained
    o, d = get_rays(jnp.asarray(ds.directions), jnp.asarray(ds.poses[0]))
    out = render_test(state["params"], cfg.model, state["occ"], o, d,
                      chunk=48 * 48, max_samples=cfg.max_samples,
                      n_cand=64, k_samples=16)
    dep = np.asarray(out["depth"])
    opa = np.asarray(out["opacity"])
    hit = opa > 0.5
    assert hit.any()
    # camera at radius 1.2 looking at objects around the origin
    assert 0.5 < dep[hit].mean() < 2.0
