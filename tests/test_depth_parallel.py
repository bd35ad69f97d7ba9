"""Depth-model data parallelism: SyncBN (cross-replica batch stats) and
comm helpers (SURVEY §2.5 SyncBatchNorm row)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from google_nerf_tpu.depth.model import (DepthModelConfig, DepthNet,
                                         init_depth_model)

N_DEV = 8


@pytest.mark.slow
def test_syncbn_matches_global_batch_stats():
    """BatchNorm with axis_name reduces over the whole global batch: a
    sharded forward must equal the unsharded forward (the reference's
    convert_sync_batchnorm semantics, `Train/tools/train.py:473`)."""
    mesh = Mesh(np.array(jax.devices()[:N_DEV]), ("data",))
    cfg_sync = DepthModelConfig(backbone="resnet18", bn_axis_name="data")
    cfg_plain = DepthModelConfig(backbone="resnet18")
    variables = init_depth_model(jax.random.PRNGKey(0), cfg_plain, (32, 32))
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (N_DEV * 2, 32, 32, 3))

    # unsharded training forward (global batch stats)
    ref, _ = DepthNet(cfg_plain).apply(variables, rgb, train=True,
                                       mutable=["batch_stats"])

    def per_shard(v, x):
        out, _ = DepthNet(cfg_sync).apply(v, x, train=True,
                                          mutable=["batch_stats"])
        return out

    sharded = shard_map(per_shard, mesh=mesh, in_specs=(P(), P("data")),
                        out_specs=P("data"), check_vma=False)
    out = sharded(variables, rgb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_reduce_dict_inside_shard_map():
    from google_nerf_tpu.parallel.comm import reduce_dict
    mesh = Mesh(np.array(jax.devices()[:N_DEV]), ("data",))

    def f(x):
        d = reduce_dict({"a": x.sum()}, "data")
        return d["a"]

    sharded = shard_map(f, mesh=mesh, in_specs=(P("data"),),
                        out_specs=P(), check_vma=False)
    x = jnp.arange(N_DEV * 4, dtype=jnp.float32)
    out = sharded(x)
    assert float(out) == pytest.approx(float(x.sum()) / N_DEV)


def test_comm_single_host_helpers():
    from google_nerf_tpu.parallel import comm
    assert comm.get_world_size() == 1
    assert comm.get_rank() == 0
    assert comm.is_main_process()
    comm.synchronize()  # no-op
    objs = comm.all_gather_objects({"x": jnp.ones(3)})
    assert len(objs) == 1
