"""Collective helpers — parity surface for the reference comm layer.

Rebuild of `LeReS Train/lib/utils/comm.py` on JAX collectives: the
reference wraps torch.distributed NCCL (get_world_size/get_rank/
synchronize `comm.py:12-44`, pickle-padded all_gather `:47-87`,
reduce_dict `:90-116`).  On TPU the in-program collectives are
`lax.psum/pmean` (compiled onto ICI); the host-side object gathers go
through multihost_utils.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Global barrier across hosts (`comm.py:32-44`)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("google_nerf_tpu.barrier")


def all_gather_objects(obj: Any):
    """Gather arbitrary pytrees of arrays from every host
    (`comm.py:47-87`'s pickle gather without the pickle)."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(obj)
    n = jax.process_count()
    return [jax.tree.map(lambda x: x[i], gathered) for i in range(n)]


def reduce_dict(d: Dict[str, jnp.ndarray], axis_name: str = "data",
                average: bool = True) -> Dict[str, jnp.ndarray]:
    """Cross-replica reduction of a scalar dict INSIDE a pmapped/shard_mapped
    computation (`reduce_dict`, `comm.py:90-116`)."""
    op = jax.lax.pmean if average else jax.lax.psum
    return {k: op(v, axis_name) for k, v in d.items()}


def reduce_loss_dict(losses: Dict[str, jnp.ndarray],
                     axis_name: str = "data") -> Dict[str, jnp.ndarray]:
    """The trainer's logging reduction (`Train/tools/train.py:79-101`)."""
    return reduce_dict(losses, axis_name, average=True)
