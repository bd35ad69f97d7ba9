import pytest
"""Multi-scene parallel training: scenes train simultaneously and
independently (SURVEY §2.5 stretch)."""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from google_nerf_tpu.data.synthetic import SyntheticDataset
from google_nerf_tpu.models.ngp import NGPConfig
from google_nerf_tpu.parallel.multiscene import (make_multiscene_train_step,
                                                 stack_scenes, stack_states,
                                                 unstack_states)
from google_nerf_tpu.train.system import (TrainConfig, grid_update_step,
                                          init_train_state)

S = 4


@pytest.mark.slow
def test_multiscene_step_trains_each_scene():
    mesh = Mesh(np.array(jax.devices()[:S]), ("scene",))
    model = NGPConfig(scale=0.5, encoder="packed", packed_levels=2,
                      packed_log2_size=8, grid_size=16)
    cfg = TrainConfig(model=model, batch_size=128, k_samples=8,
                      max_samples=32, samples_budget=0)
    states, scenes = [], []
    for s in range(S):
        ds = SyntheticDataset(split="train", n_images=3, img_wh=(16, 16),
                              seed=s)
        st = init_train_state(jax.random.PRNGKey(s), cfg, ds.K, ds.poses,
                              ds.img_wh)
        st = grid_update_step(st, jax.random.PRNGKey(100 + s), cfg=cfg,
                              warmup=True)
        states.append(st)
        scenes.append(ds.scene())
    stacked = stack_states(states)
    scene_stack = stack_scenes(scenes)
    step = make_multiscene_train_step(cfg, mesh)
    for i in range(3):
        stacked, metrics = step(stacked, scene_stack,
                                jax.random.fold_in(jax.random.PRNGKey(7),
                                                   i))
    assert metrics["loss"].shape == (S,)
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    outs = unstack_states(stacked, S)
    # per-scene params must have diverged from each other (independent)
    t0 = np.asarray(outs[0]["params"]["packed_table"])
    t1 = np.asarray(outs[1]["params"]["packed_table"])
    assert not np.allclose(t0, t1)
    assert int(outs[0]["step"]) == 3
