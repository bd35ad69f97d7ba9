"""The training system: state, optimizer, jitted train step, grid cadence.

TPU-native rebuild of the reference Lightning `NeRFSystem`
(`ngp_pl/train.py:56-234`):
  * FusedAdam(lr, eps=1e-15) + CosineAnnealingLR(num_epochs, lr/30)
    (`train.py:112-122`)  ->  optax.adam + per-epoch cosine schedule
  * density-grid update every S=16 steps, warmup (all cells) for the first
    256 steps, erode for colmap scenes (`train.py:144-148`)
  * optional extrinsics refinement dR/dT with lr 1e-6 (`train.py:100-119`)
  * per-step telemetry: loss, psnr, s_per_ray (`train.py:161-168`)

Everything device-side is a single pytree `TrainState`; the whole train step
(batch sampling -> ray gen -> march -> MLP -> composite -> loss -> adam) is
one jitted XLA program with no host synchronisation.  Images can live on
device (uint8) so even batch sampling stays on-chip.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from google_nerf_tpu.core.rays import axisangle_to_R, get_rays
from google_nerf_tpu.models.ngp import NGPConfig, init_ngp, ngp_density
from google_nerf_tpu.models.rendering import MAX_SAMPLES, render_train
from google_nerf_tpu.ops.grid import (mark_invisible_cells,
                                      pack_occupancy_blocks,
                                      pack_occupancy_u8,
                                      update_density_grid)
from google_nerf_tpu.ops.march_block import pack_occupancy_block2
from google_nerf_tpu.ops.march_seg import required_dilation_radius
from google_nerf_tpu.train.losses import NeRFLoss

SQRT3 = 3.0 ** 0.5


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: NGPConfig = NGPConfig()
    lr: float = 1e-2                       # opt.py:37
    num_epochs: int = 30                   # opt.py:26
    steps_per_epoch: int = 1000            # datasets/base.py:19-22
    batch_size: int = 8192                 # opt.py:24
    k_samples: int = 256                   # padded samples per ray.  MUST be
                                           # large enough that content rays
                                           # are rarely truncated: chronic
                                           # truncation creates floater fog
                                           # (supervision bias) — see
                                           # DESIGN_NOTES.md fog record.
    max_samples: int = MAX_SAMPLES
    exp_step_factor: float = 0.0
    optimize_ext: bool = False
    lambda_opacity: float = 1e-3
    lambda_depth: float = 0.0
    grid_update_interval: int = 16         # train.py:61 (S)
    grid_sample_div: int = 4               # vren recipe: M = G^3/4 cells
    warmup_steps: int = 256                # train.py:147
    erode: bool = False                    # train.py:148 (colmap)
    T_threshold: float = 1e-4
    samples_budget: int = 0                # 0 = no compaction (eval all
                                           # padded slots); else MLP/encoder
                                           # run on <= budget real samples
    random_bg: bool = False                # train against random background
                                           # colors when the scene provides
                                           # per-ray gt alpha — kills white-
                                           # invisible floater fog (clear
                                           # win at small scale; still under
                                           # study at 256^2+, so opt-in)
    exclude_incomplete: str = "backfill"   # "none" | "hard" | "floor" |
                                           # "backfill": drop
                                           # rays whose march truncated real
                                           # content before transmittance
                                           # converged (unbiased gradients;
                                           # see models/rendering.py).
                                           # "floor" keeps >= incomplete_floor
                                           # of the batch supervised.
    incomplete_floor: float = 0.5
    random_bg_per_ray: bool = True         # one random bg color PER RAY
                                           # (False = one per batch).  A
                                           # per-batch color is a moving
                                           # target fog can chase step-to-
                                           # step; per-ray colors make
                                           # transparency the only loss
                                           # minimiser at fog points.
    weight_decay: float = 0.0              # decoupled L2 on the ENCODER
                                           # TABLE only (AdamW-style).
                                           # Colliding/stale table entries
                                           # that stop receiving gradient
                                           # decay to 0, where the bias-free
                                           # sigma MLP yields trunc_exp(0)=1
                                           # < density_threshold — so stale
                                           # fog cells die instead of
                                           # ratcheting in the EMA grid.
    march: str = "seg"                     # "seg" (two-phase, bounded
                                           # scenes) | "block" (one-phase
                                           # 8^3 block rows, single-cascade
                                           # only — ops/march_block.py)
                                           # | "dense"
    seg: int = 8                           # candidates per segment
    n_keep: int = 32                       # live segments kept per ray
    sup: int = 4                           # segments per super-segment
                                           # (3-phase march; 0 = 2-phase)
    n_keep_sup: int = 24                   # live super-segments kept
    block_group: int = 0                   # march="block": candidates per
                                           # block row (0 = auto max)
    n_keep_groups: int = 0                 # march="block": live groups
                                           # kept (0 = k_samples/group)

    @property
    def density_threshold(self) -> float:
        return 0.01 * self.max_samples / SQRT3   # train.py:146

    @property
    def total_steps(self) -> int:
        return self.num_epochs * self.steps_per_epoch


def cosine_lr(cfg: TrainConfig):
    """Per-epoch cosine from lr to lr/30 (CosineAnnealingLR semantics)."""
    eta_min = cfg.lr / 30

    def schedule(step):
        epoch = jnp.minimum(step // cfg.steps_per_epoch, cfg.num_epochs)
        return eta_min + 0.5 * (cfg.lr - eta_min) * (
            1 + jnp.cos(jnp.pi * epoch / cfg.num_epochs))

    return schedule


_TABLE_KEYS = ("packed_table", "pair_table", "hash_table")


def make_optimizer(cfg: TrainConfig):
    if cfg.weight_decay > 0:
        def table_mask(params):
            return {k: jax.tree.map(lambda _: k in _TABLE_KEYS, v)
                    for k, v in params.items()}

        # adamw's state pytree is identical to adam's -> ckpt compatible
        net_tx = optax.adamw(cosine_lr(cfg), eps=1e-15,
                             weight_decay=cfg.weight_decay, mask=table_mask)
    else:
        net_tx = optax.adam(cosine_lr(cfg), eps=1e-15)
    if not cfg.optimize_ext:
        return net_tx
    pose_tx = optax.adam(1e-6)  # hard-coded lr, train.py:117-118

    def label_fn(params):
        return {k: ("pose" if k in ("dR", "dT") else "net") for k in params}

    return optax.multi_transform({"net": net_tx, "pose": pose_tx}, label_fn)


def init_train_state(key, cfg: TrainConfig, K, poses, img_wh) -> Dict[str, Any]:
    """K: (3,3) intrinsics; poses: (N,3,4) c2w; img_wh: (w, h)."""
    m = cfg.model
    params = init_ngp(key, m)
    if cfg.optimize_ext:
        n = poses.shape[0]
        params["dR"] = jnp.zeros((n, 3))
        params["dT"] = jnp.zeros((n, 3))
    density_grid = mark_invisible_cells(
        jnp.asarray(K, jnp.float32), jnp.asarray(poses, jnp.float32),
        img_w=int(img_wh[0]), img_h=int(img_wh[1]), grid_size=m.grid_size,
        cascades=m.cascades, scale=m.scale)
    occ = jnp.zeros((m.cascades,) + (m.grid_size,) * 3, bool)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    if cfg.march == "block2" and m.cascades == 1:
        gs4 = m.grid_size // 4
        gq = m.grid_size // 8
        occ_u8 = dict(blocks4=jnp.zeros((gs4 ** 3, 16), jnp.int32),
                      super=jnp.zeros((gq ** 3,), jnp.int32))
    elif cfg.march == "block" and m.cascades == 1:
        occ_u8 = jnp.zeros((m.grid_size ** 3, 16), jnp.int32)
    else:
        occ_u8 = jnp.zeros_like(occ, jnp.int32)
    return dict(params=params, opt_state=opt_state,
                density_grid=density_grid, occ=occ,
                occ_u8=occ_u8,
                step=jnp.zeros((), jnp.int32))


def refined_poses(params, poses, img_idxs):
    """Apply dR/dT extrinsics refinement (train.py:151-155)."""
    p = poses[img_idxs]
    if "dR" not in params:
        return p
    dR = axisangle_to_R(params["dR"][img_idxs])
    hi = jax.lax.Precision.HIGHEST
    R = jnp.einsum("nij,njk->nik", dR, p[..., :3], precision=hi)
    t = p[..., 3] + params["dT"][img_idxs]
    return jnp.concatenate([R, t[..., None]], -1)


def sample_batch(key, scene: Dict[str, Any], batch_size: int):
    """On-device random (image, pixel) batch (datasets/base.py:24-33)."""
    rays = scene["images"]
    n_img, n_pix = rays.shape[0], rays.shape[1]
    k1, k2 = jax.random.split(key)
    img_idxs = jax.random.randint(k1, (batch_size,), 0, n_img)
    pix_idxs = jax.random.randint(k2, (batch_size,), 0, n_pix)
    rgb = rays[img_idxs, pix_idxs]
    if rgb.dtype == jnp.uint8:
        rgb = rgb.astype(jnp.float32) / 255.0
    batch = dict(rgb=rgb, img_idxs=img_idxs, pix_idxs=pix_idxs)
    if "alphas" in scene:
        batch["alpha"] = scene["alphas"][img_idxs, pix_idxs]
    if "depths" in scene and scene["depths"] is not None:
        batch["depth"] = scene["depths"][img_idxs, pix_idxs]
    return batch


def loss_and_results(params, occ, scene, batch, key, cfg: TrainConfig,
                     step=None):
    """The differentiable part of a train step (shared by the single-chip
    and data-parallel paths).  occ: dict with "occ" (bool grid) and
    "occ_u8" (packed dilated grid for the segment marcher).  `step` (traced)
    gates warmup-dependent behavior (backfill activation)."""
    step_now = jnp.asarray(cfg.warmup_steps if step is None else step)
    loss_obj = NeRFLoss(cfg.lambda_opacity, cfg.lambda_depth)
    poses = refined_poses(params, scene["poses"], batch["img_idxs"])
    dirs = scene["directions"][batch["pix_idxs"]]
    rays_o, rays_d = get_rays(dirs, poses)
    bg_color = None
    if cfg.random_bg and "alpha" in batch:
        key, kbg = jax.random.split(key)
        bg_shape = ((batch["rgb"].shape[0], 3) if cfg.random_bg_per_ray
                    else (3,))
        bg_color = jax.random.uniform(kbg, bg_shape)
        # re-composite the white-bg ground truth onto the random bg
        batch = dict(batch)
        batch["rgb"] = batch["rgb"] - (1.0 - batch["alpha"])[:, None]             * (1.0 - bg_color)
    results = render_train(params, cfg.model, occ["occ"], rays_o, rays_d,
                           key,
                           exp_step_factor=cfg.exp_step_factor,
                           T_threshold=cfg.T_threshold,
                           k_samples=cfg.k_samples,
                           max_samples=cfg.max_samples,
                           samples_budget=cfg.samples_budget,
                           occ_u8=(occ["occ_u8"]
                                   if cfg.march in ("seg", "block", "block2")
                                   and cfg.exp_step_factor == 0.0 else None),
                           march=(cfg.march if cfg.march in ("block",
                                                             "block2")
                                  and cfg.model.cascades == 1 else "seg"),
                           seg=cfg.seg, n_keep=cfg.n_keep, sup=cfg.sup,
                           n_keep_sup=cfg.n_keep_sup,
                           block_group=cfg.block_group,
                           n_keep_groups=cfg.n_keep_groups,
                           bg_color=bg_color,
                           exclude_incomplete=cfg.exclude_incomplete,
                           incomplete_floor=cfg.incomplete_floor,
                           backfill_rgb=batch["rgb"],
                           backfill_enable=(step_now >= cfg.warmup_steps))
    total, _ = loss_obj.total(results, batch)
    # telemetry: expose the target actually supervised (random-bg aware)
    results["rgb_target"] = batch["rgb"]
    return total, results


def apply_grads(state, grads, cfg: TrainConfig):
    """Optimizer update -> (params, opt_state)."""
    tx = make_optimizer(cfg)
    updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
    params = optax.apply_updates(state["params"], updates)
    return params, opt_state


def _train_step_impl(state, scene, batch, key, cfg: TrainConfig):
    def loss_fn(params):
        return loss_and_results(
            params, {"occ": state["occ"], "occ_u8": state["occ_u8"]},
            scene, batch, key, cfg, step=state["step"])

    (loss, results), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state["params"])
    tx = make_optimizer(cfg)
    updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
    params = optax.apply_updates(state["params"], updates)

    rm = results.get("ray_mask", jnp.ones((), bool))
    rmw = jnp.broadcast_to(rm[..., None] if rm.ndim else rm,
                           results["rgb"].shape)
    target = results.get("rgb_target", batch["rgb"])
    mse = (jnp.sum(jnp.where(rmw, (results["rgb"] - target) ** 2, 0.0))
           / jnp.maximum(rmw.sum(), 1))
    metrics = dict(
        loss=loss,
        psnr=-10.0 * jnp.log10(jnp.maximum(mse, 1e-10)),
        s_per_ray=results["total_samples"] / batch["rgb"].shape[0],
        mask_frac=(rm.mean() if rm.ndim else jnp.ones(())),
        lr=cosine_lr(cfg)(state["step"]),
    )
    new_state = dict(params=params, opt_state=opt_state,
                     density_grid=state["density_grid"], occ=state["occ"],
                     occ_u8=state["occ_u8"], step=state["step"] + 1)
    return new_state, metrics


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def train_step(state, scene, batch, key, *, cfg: TrainConfig):
    """One optimization step on an explicit (host-fed) ray batch."""
    return _train_step_impl(state, scene, batch, key, cfg)


@partial(jax.jit, static_argnames=("cfg", "warmup"),
         donate_argnames=("state",))
def grid_update_step(state, key, *, cfg: TrainConfig, warmup: bool):
    """Density-grid maintenance (train.py:145-148)."""
    m = cfg.model
    params = state["params"]

    def density_fn(x):
        return ngp_density(params, m, x)

    new_grid, occ = update_density_grid(
        state["density_grid"], density_fn, key, scale=m.scale,
        density_threshold=cfg.density_threshold, warmup=warmup,
        erode=cfg.erode, sample_div=cfg.grid_sample_div)
    out = dict(state)
    out["density_grid"] = new_grid
    out["occ"] = occ
    if cfg.march == "block2" and m.cascades == 1:
        out["occ_u8"] = pack_occupancy_block2(
            occ, max_samples=cfg.max_samples, scale=m.scale)
    elif cfg.march == "block" and m.cascades == 1:
        out["occ_u8"] = pack_occupancy_blocks(occ)
    else:
        out["occ_u8"] = pack_occupancy_u8(
            occ, required_dilation_radius(cfg.seg, m.grid_size,
                                          cfg.max_samples, m.scale),
            super_radius=(required_dilation_radius(
                cfg.seg * cfg.sup, m.grid_size, cfg.max_samples, m.scale)
                if cfg.sup > 1 else 0))
    return out


@partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def fused_train_step(state, scene, key, *, cfg: TrainConfig):
    """Sample + step, fully on device (used by bench / dryrun / CLI when the
    image store is device-resident)."""
    k1, k2 = jax.random.split(key)
    batch = sample_batch(k1, scene, cfg.batch_size)
    return _train_step_impl(state, scene, batch, k2, cfg)


@partial(jax.jit, static_argnames=("cfg", "n_steps"),
         donate_argnames=("state",))
def fused_train_steps(state, scene, key, *, cfg: TrainConfig, n_steps: int):
    """n_steps fused steps under ONE dispatch via lax.scan.

    NOT a throughput win: the apparent ~10 ms/step wall-vs-device gap
    that motivated this was the AMORTIZED GRID UPDATE (every 16 steps),
    not dispatch glue, and the scan measured ~5 ms/step SLOWER than the
    eager donated loop (DESIGN_NOTES R4.3/R4.4).  Kept for the
    single-dispatch API (e.g. driving training over an rpc relay where
    per-step round-trips dominate).  Step i draws key fold_in(key, i);
    metrics returned are the LAST step's (the same observable the
    serial loop reports).
    """
    def body(st, i):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        batch = sample_batch(k1, scene, cfg.batch_size)
        return _train_step_impl(st, scene, batch, k2, cfg)

    state, ms = jax.lax.scan(body, state, jnp.arange(n_steps))
    return state, jax.tree.map(lambda x: x[-1], ms)


def run_training(state, scene, cfg: TrainConfig, *, steps: int,
                 key: Optional[jax.Array] = None, log_every: int = 0,
                 log_fn=print):
    """Simple host driver: grid cadence + fused steps.  Returns final state
    and the last metrics dict (device arrays)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    metrics = None
    for _ in range(steps):
        step = int(state["step"])
        if step % cfg.grid_update_interval == 0:
            state = grid_update_step(state,
                                     jax.random.fold_in(key, 2 * step + 1),
                                     cfg=cfg, warmup=step < cfg.warmup_steps)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, 2 * step),
                                          cfg=cfg)
        if log_every and (step + 1) % log_every == 0:
            log_fn(f"step {step + 1}: "
                   + " ".join(f"{k}={float(v):.4g}"
                              for k, v in metrics.items()))
    return state, metrics
