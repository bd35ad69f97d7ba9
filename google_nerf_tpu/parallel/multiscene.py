"""Multi-scene parallel training: one scene per mesh group.

SURVEY.md §2.5 stretch goal: the reference's benchmark suites train scenes
SEQUENTIALLY (`ngp_pl/benchmarking/*.sh`); on a pod, independent scenes are
embarrassingly parallel — train S scenes simultaneously over a
`Mesh(('scene',))`, each group running the full fused train step on its own
replica of params/grids/optimizer.  Combine with the 'data' axis of
parallel/dp.py for a (scene, data) mesh on larger slices.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from google_nerf_tpu.train.system import (TrainConfig, _train_step_impl,
                                          sample_batch)


def stack_states(states):
    """List of per-scene TrainStates -> stacked pytree with leading S."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def unstack_states(stacked, n: int):
    return [jax.tree.map(lambda x: x[i], stacked) for i in range(n)]


def stack_scenes(scenes):
    """Per-scene scene() pytrees (must share shapes) -> stacked pytree."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)


def make_multiscene_train_step(cfg: TrainConfig, mesh: Mesh,
                               axis_name: str = "scene"):
    """Returns jitted step(stacked_state, stacked_scene, key) training every
    scene simultaneously, one per mesh group."""
    n = mesh.shape[axis_name]

    def per_scene(state, scene, keys):
        state = jax.tree.map(lambda x: x[0], state)   # strip scene dim
        scene = jax.tree.map(lambda x: x[0], scene)
        k1, k2 = jax.random.split(keys[0])
        batch = sample_batch(k1, scene, cfg.batch_size)
        new_state, metrics = _train_step_impl(state, scene, batch, k2, cfg)
        expand = lambda t: jax.tree.map(lambda x: x[None], t)
        return expand(new_state), expand(metrics)

    sharded = shard_map(per_scene, mesh=mesh,
                        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
                        out_specs=(P(axis_name), P(axis_name)),
                        check_vma=False)

    @jax.jit
    def step(stacked_state, stacked_scene, key):
        keys = jax.random.split(key, n)
        return sharded(stacked_state, stacked_scene, keys)

    return step
