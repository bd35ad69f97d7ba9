"""Data-parallel training over a device mesh (SURVEY.md §2.5, §5.8).

The reference scales with NCCL DDP (one process per GPU, implicit grad
all-reduce, `ngp_pl/train.py:262`, LeReS `Train/tools/train.py:462-481`).
The TPU-native equivalent: ONE program, a `jax.sharding.Mesh` over the chips,
and `shard_map` of the per-replica step with `lax.pmean` gradient/metric
reduction compiled onto ICI — no communication code at call sites.

Sharding layout (ray-batch DP — the reference's only parallelism axis, plus
the SP analog discussed in SURVEY §5.7):
  * params / optimizer / density grid / occupancy: replicated
  * ray batch (and its per-ray sample grid): sharded over axis 'data'
  * gradients, loss, metrics: pmean over 'data'
  * occupancy-grid updates run replicated (identical keys -> identical
    result on every replica; a pmax-merged sharded evaluation is a planned
    optimisation)
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

try:  # jax >= 0.5 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from google_nerf_tpu.train.system import (TrainConfig, apply_grads, cosine_lr,
                                          loss_and_results, sample_batch)


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def make_dp_train_step(cfg: TrainConfig, mesh: Mesh, axis_name: str = "data"):
    """Returns jitted step(state, scene, key) running data-parallel over the
    mesh.  `key` is a single PRNG key; each replica derives its own."""
    n = mesh.shape[axis_name]
    if cfg.batch_size % n:
        raise ValueError(f"batch_size {cfg.batch_size} not divisible by "
                         f"mesh size {n}")
    local_bs = cfg.batch_size // n

    def per_replica(state, scene, keys):
        key = keys[0]
        k1, k2 = jax.random.split(key)
        batch = sample_batch(k1, scene, local_bs)

        def loss_fn(params):
            occ = {"occ": state["occ"], "occ_u8": state["occ_u8"]}
            return loss_and_results(params, occ, scene, batch, k2, cfg)

        (loss, results), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        grads = jax.lax.pmean(grads, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        mse = jax.lax.pmean(
            jnp.mean((results["rgb"] - batch["rgb"]) ** 2), axis_name)
        s_per_ray = jax.lax.pmean(
            results["total_samples"] / local_bs, axis_name)

        params, opt_state = apply_grads(state, grads, cfg)
        metrics = dict(loss=loss,
                       psnr=-10.0 * jnp.log10(jnp.maximum(mse, 1e-10)),
                       s_per_ray=s_per_ray,
                       lr=cosine_lr(cfg)(state["step"]))
        new_state = dict(params=params, opt_state=opt_state,
                         density_grid=state["density_grid"],
                         occ=state["occ"], occ_u8=state["occ_u8"],
                         step=state["step"] + 1)
        return new_state, metrics

    sharded = shard_map(per_replica, mesh=mesh,
                        in_specs=(P(), P(), P(axis_name)),
                        out_specs=(P(), P()), check_vma=False)

    @jax.jit
    def step(state, scene, key):
        keys = jax.random.split(key, n)
        return sharded(state, scene, keys)

    return step


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
