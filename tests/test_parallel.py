"""Data-parallel tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from google_nerf_tpu.data.synthetic import SyntheticDataset
from google_nerf_tpu.models.ngp import NGPConfig
from google_nerf_tpu.parallel.dp import (make_dp_train_step, make_mesh,
                                         replicate)
from google_nerf_tpu.train.system import (TrainConfig, grid_update_step,
                                          init_train_state)


def _cfg():
    model = NGPConfig(scale=0.5, encoder="hash", num_levels=4,
                      log2_hashmap_size=12, grid_size=32)
    return TrainConfig(model=model, batch_size=1024, k_samples=16,
                       max_samples=64, steps_per_epoch=10, num_epochs=1)


def test_mesh_has_8_devices():
    assert jax.device_count() == 8
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_dp_train_step_runs_and_reduces():
    ds = SyntheticDataset(split="train", n_images=4, img_wh=(32, 32))
    cfg = _cfg()
    mesh = make_mesh()
    state = init_train_state(jax.random.PRNGKey(0), cfg, ds.K, ds.poses,
                             ds.img_wh)
    scene = ds.scene()
    state = replicate(state, mesh)
    scene = replicate(scene, mesh)
    state = grid_update_step(state, jax.random.PRNGKey(1), cfg=cfg,
                             warmup=True)
    step = make_dp_train_step(cfg, mesh)
    for i in range(3):
        state, metrics = step(state, scene, jax.random.PRNGKey(i + 2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state["step"]) == 3
    # params replicated after update: all devices agree
    w = state["params"]["sigma_mlp"][0]
    assert np.isfinite(np.asarray(w)).all()


@pytest.mark.slow
def test_dp_matches_single_device_gradient_direction():
    """A DP step with the same global batch must move params, and metrics
    must be finite; exact equality with single-chip isn't required (batch
    RNG differs) but the loss must decrease over a few steps."""
    ds = SyntheticDataset(split="train", n_images=4, img_wh=(32, 32))
    cfg = _cfg()
    mesh = make_mesh()
    state = init_train_state(jax.random.PRNGKey(0), cfg, ds.K, ds.poses,
                             ds.img_wh)
    scene = replicate(ds.scene(), mesh)
    state = replicate(state, mesh)
    state = grid_update_step(state, jax.random.PRNGKey(1), cfg=cfg,
                             warmup=True)
    step = make_dp_train_step(cfg, mesh)
    losses = []
    for i in range(20):
        state, metrics = step(state, scene, jax.random.PRNGKey(100 + i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
