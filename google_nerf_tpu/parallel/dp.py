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


def make_dp_train_step(cfg: TrainConfig, mesh: Mesh, axis_name: str = "data",
                       collectives: bool = True):
    """Returns jitted step(state, scene, key) running data-parallel over the
    mesh.  `key` is a single PRNG key; each replica derives its own.

    collectives=False is a TIMING PROBE ONLY: the pmean reductions are
    skipped, so replicas' params drift apart — the step is numerically
    WRONG for training.  weak_scaling_report uses it to break the
    measured step cost into compute vs grad-allreduce components."""
    n = mesh.shape[axis_name]
    if cfg.batch_size % n:
        raise ValueError(f"batch_size {cfg.batch_size} not divisible by "
                         f"mesh size {n}")
    local_bs = cfg.batch_size // n
    reduce = ((lambda x: jax.lax.pmean(x, axis_name)) if collectives
              else (lambda x: x))

    def per_replica(state, scene, keys):
        key = keys[0]
        k1, k2 = jax.random.split(key)
        batch = sample_batch(k1, scene, local_bs)

        def loss_fn(params):
            occ = {"occ": state["occ"], "occ_u8": state["occ_u8"]}
            return loss_and_results(params, occ, scene, batch, k2, cfg,
                                    step=state["step"])

        (loss, results), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        grads = reduce(grads)
        loss = reduce(loss)
        rm = results.get("ray_mask", jnp.ones((), bool))
        rmw = jnp.broadcast_to(rm[..., None] if rm.ndim else rm,
                               results["rgb"].shape)
        target = results.get("rgb_target", batch["rgb"])
        mse = reduce(
            jnp.sum(jnp.where(rmw, (results["rgb"] - target) ** 2,
                              0.0)) / jnp.maximum(rmw.sum(), 1))
        s_per_ray = reduce(results["total_samples"] / local_bs)

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


def make_dp_grid_update(cfg: TrainConfig, mesh: Mesh,
                        axis_name: str = "data"):
    """Sharded density-grid maintenance: every replica draws the SAME
    sample set (same key), evaluates 1/n of it, pmax merges the maxima
    (SURVEY.md §5.8).  Bit-identical to the serial `grid_update_step` with
    the same key (max is exact-associative)."""
    from google_nerf_tpu.models.ngp import ngp_density
    from google_nerf_tpu.ops.grid import (pack_occupancy_blocks,
                                          pack_occupancy_u8,
                                          update_density_grid)
    from google_nerf_tpu.ops.march_block import pack_occupancy_block2
    from google_nerf_tpu.ops.march_seg import required_dilation_radius

    m = cfg.model

    def pack(occ):
        # mirror train.system.grid_update_step: the packed layout must
        # match the marcher cfg.march selects in loss_and_results
        if cfg.march == "block2" and m.cascades == 1:
            return pack_occupancy_block2(occ, max_samples=cfg.max_samples,
                                         scale=m.scale)
        if cfg.march == "block" and m.cascades == 1:
            return pack_occupancy_blocks(occ)
        return pack_occupancy_u8(
            occ, required_dilation_radius(cfg.seg, m.grid_size,
                                          cfg.max_samples, m.scale),
            super_radius=(required_dilation_radius(
                cfg.seg * cfg.sup, m.grid_size, cfg.max_samples,
                m.scale) if cfg.sup > 1 else 0))

    def build(warmup: bool):
        def per_replica(state, key):
            def density_fn(x):
                return ngp_density(state["params"], m, x)

            new_grid, occ = update_density_grid(
                state["density_grid"], density_fn, key, scale=m.scale,
                density_threshold=cfg.density_threshold, warmup=warmup,
                erode=cfg.erode, axis_name=axis_name,
                sample_div=cfg.grid_sample_div)
            out = dict(state)
            out["density_grid"] = new_grid
            out["occ"] = occ
            out["occ_u8"] = pack(occ)
            return out

        # key is REPLICATED (P()): every replica draws the same sample set
        # and slices by axis_index inside update_density_grid
        return shard_map(per_replica, mesh=mesh,
                         in_specs=(P(), P()),
                         out_specs=P(), check_vma=False)

    sharded = {w: build(w) for w in (False, True)}

    @partial(jax.jit, static_argnames=("warmup",))
    def step(state, key, warmup: bool):
        return sharded[bool(warmup)](state, key)

    return step


def render_test_fast_dp(params, cfg, occ_u8, rays_o, rays_d, mesh: Mesh,
                        axis_name: str = "data", **kw):
    """Data-parallel novel-view render: rays sharded over the mesh, each
    replica runs the full fast renderer on its shard (chunks are independent,
    so no collectives are needed — the TPU-native analog of the reference's
    per-rank validation + `all_gather_ddp_if_available` metric gather,
    `ngp_pl/train.py:218-227`; here the gather is the output sharding)."""
    from google_nerf_tpu.models.render_test_fast import render_test_fast

    n = mesh.shape[axis_name]
    R = rays_o.shape[0]
    pad = (-R) % n
    ro = jnp.concatenate([rays_o, jnp.zeros((pad, 3))]) if pad else rays_o
    rd = jnp.concatenate([rays_d, jnp.ones((pad, 3))]) if pad else rays_d

    def per_replica(params, occ_u8, o, d):
        return render_test_fast(params, cfg, occ_u8, o, d, **kw)

    sharded = shard_map(per_replica, mesh=mesh,
                        in_specs=(P(), P(), P(axis_name), P(axis_name)),
                        out_specs=P(axis_name), check_vma=False)
    out = sharded(replicate(params, mesh), replicate(occ_u8, mesh), ro, rd)
    return {k: v[:R] for k, v in out.items()}


def render_test_oneshot_dp(params, cfg, occ_u8, rays_o, rays_d, mesh: Mesh,
                           axis_name: str = "data", **kw):
    """Data-parallel one-shot serving render: rays sharded over the mesh,
    each replica runs the full one-shot renderer (main pass + straggler
    drain) on its shard.  Rays are independent, so there are no
    collectives and FPS scales linearly with the mesh — the TPU-native
    serving answer to per-chip gather-bandwidth limits (serve novel views
    on a slice, not a chip).  Same sharding contract as
    render_test_fast_dp above."""
    from google_nerf_tpu.models.render_test_oneshot import \
        render_test_oneshot

    n = mesh.shape[axis_name]
    R = rays_o.shape[0]
    pad = (-R) % n
    ro = jnp.concatenate([rays_o, jnp.zeros((pad, 3))]) if pad else rays_o
    rd = jnp.concatenate([rays_d, jnp.ones((pad, 3))]) if pad else rays_d

    def per_replica(params, occ_u8, o, d):
        out = render_test_oneshot(params, cfg, occ_u8, o, d, **kw)
        # per-ray fields only: scalar drain stats can't take the ray
        # sharding (and differ per replica anyway)
        return {k: v for k, v in out.items()
                if v.ndim >= 1 and v.shape[0] == o.shape[0]}

    sharded = shard_map(per_replica, mesh=mesh,
                        in_specs=(P(), P(), P(axis_name), P(axis_name)),
                        out_specs=P(axis_name), check_vma=False)
    out = sharded(replicate(params, mesh), replicate(occ_u8, mesh), ro, rd)
    return {k: v[:R] for k, v in out.items()}


def render_brick_dp(baked, cfg, rays_o, rays_d, W, H, mesh: Mesh,
                    axis_name: str = "data", *, bcfg=None, tile: int = 8,
                    L: int = 256, Lk: int = 24, max_samples: int = 512,
                    T_threshold: float = 1e-2, pairs_per_ray: float = 3.0,
                    pass_fracs: tuple = (), drain_frac: float = 0.25,
                    macro_tiles: int = 8, macro_L: int = 1024,
                    geometry=None):
    """Data-parallel brick serving render: the tile-ordered ray stream is
    block-sharded over the mesh, each replica rasterizes its contiguous
    band of tiles against the replicated brick pool.  Tiles are
    independent (cull -> windows -> field -> per-ray combine), so there
    are no collectives and FPS scales linearly — same contract as
    render_test_oneshot_dp above.  Telemetry is summed across replicas."""
    from google_nerf_tpu.models.baked import BakedConfig, baked_extent
    from google_nerf_tpu.models.render_brick import (SQRT3, _render_tiles,
                                                     brick_geometry,
                                                     tile_order)
    if bcfg is None:
        bcfg = BakedConfig()
    lo, hi, pool_base = geometry if geometry is not None else \
        brick_geometry(baked["block_map"], bcfg, cfg)
    n = mesh.shape[axis_name]
    tpx = tile * tile

    # pad the image to a tile multiple, then the tile count to a multiple
    # of the mesh (extra rays originate far outside the scene -> miss)
    Wp = ((W + tile - 1) // tile) * tile
    Hp = ((H + tile - 1) // tile) * tile
    if (Wp, Hp) != (W, H):
        col = np.minimum(np.arange(Wp), W - 1)
        row = np.minimum(np.arange(Hp), H - 1)
        sel = jnp.asarray((row[:, None] * W + col[None]).reshape(-1))
        rays_o = jnp.take(rays_o, sel, axis=0)
        rays_d = jnp.take(rays_d, sel, axis=0)
    perm, inv = tile_order(Wp, Hp, tile)
    norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rdu = rays_d / jnp.where(norm > 0, norm, 1.0)
    ro_t = jnp.take(rays_o, perm, axis=0)
    rd_t = jnp.take(rdu, perm, axis=0)

    n_tiles = (Wp * Hp) // tpx
    tiles_pad = (-n_tiles) % n
    if tiles_pad:
        ro_t = jnp.concatenate(
            [ro_t, jnp.full((tiles_pad * tpx, 3), 100.0)])
        rd_t = jnp.concatenate(
            [rd_t, jnp.ones((tiles_pad * tpx, 3)) / SQRT3])
    tiles_per = (n_tiles + tiles_pad) // n

    L = min(L, int(lo.shape[0]))
    Lk = min(Lk, L)
    vox_w = 2.0 * baked_extent(cfg) / bcfg.voxel_res
    S = int(np.ceil(bcfg.block * vox_w * SQRT3 / (SQRT3 / max_samples))) + 1
    mL = min(macro_L, int(lo.shape[0]))
    mt = macro_tiles if mL > 0 else 0
    while mt > 1 and tiles_per % mt:
        mt //= 2
    render = partial(_render_tiles, cfg=cfg, bcfg=bcfg, tile=tile, L=L,
                     Lk=Lk, S=S, max_samples=max_samples,
                     T_threshold=T_threshold,
                     pairs_budget=int(tiles_per * tpx * pairs_per_ray),
                     pass_fracs=tuple(pass_fracs), drain_frac=drain_frac,
                     macro_tiles=mt if mt > 1 else 0, macro_L=mL)

    def per_replica(pool, rgb_mlp, lo, hi, pb, o, d):
        out = render(pool, rgb_mlp, lo, hi, pb, o, d)
        # scalar telemetry -> (1,) so it can ride the ray sharding
        return {k: v if v.ndim else v[None] for k, v in out.items()}

    sharded = shard_map(
        per_replica, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(axis_name), P(axis_name)),
        out_specs=P(axis_name), check_vma=False)
    rep = partial(replicate, mesh=mesh)
    out = sharded(rep(baked["pool"]), rep(baked["rgb_mlp"]), rep(lo),
                  rep(hi), rep(pool_base), ro_t, rd_t)

    def unpermute(x):
        x = jnp.take(x[:Wp * Hp], inv, axis=0)
        if (Wp, Hp) != (W, H):
            x = x.reshape((Hp, Wp) + x.shape[1:])[:H, :W]
            x = x.reshape((H * W,) + x.shape[2:])
        return x

    rgb = unpermute(out["rgb"])
    opacity = unpermute(out["opacity"])
    rgb = rgb + 1.0 * (1.0 - opacity[:, None])
    return dict(rgb=rgb, opacity=opacity, depth=unpermute(out["depth"]),
                trunc_tiles=out["trunc_tiles"].sum(),
                trunc_rays=out["trunc_rays"].sum(),
                pairs_dropped=out["pairs_dropped"].sum(),
                pairs_total=out["pairs_total"].sum())


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host initialisation (the NCCL init_process_group analog,
    reference `LeReS Train/tools/train.py:462-465`).

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID when
    args are None; a single-host run (no coordinator) is a no-op.  Returns
    the process index.
    """
    import os
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return 0
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=int(num_processes
                          or os.environ.get("JAX_NUM_PROCESSES", 1)),
        process_id=int(process_id or os.environ.get("JAX_PROCESS_ID", 0)))
    return jax.process_index()


def shard_scene_for_host(scene, n_hosts: int, host_id: int):
    """Host-sharded image store: each host keeps 1/n of the images (the
    DDP-sampler analog for multi-host data loading).  Per-replica batch
    sampling then draws only from the local shard."""
    import numpy as np
    images = scene["images"]
    n_img = images.shape[0]
    idx = np.arange(host_id, n_img, n_hosts)
    out = dict(scene)
    out["images"] = images[idx]
    out["poses"] = scene["poses"][idx]
    for k in ("depths", "alphas"):
        if scene.get(k) is not None:
            out[k] = scene[k][idx]
    return out
