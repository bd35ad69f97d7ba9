"""cIMLE depth training system.

TPU-native rebuild of `Train/tools/train.py:127-434` (do_train):
  * every `recache_epochs` epochs, sample `num_latent` z ~ N(0,1)^d per
    image in minibatches of `latent_minibatch`, keep the argmin-total_raw z
    per image (`train.py:174-251`)
  * epoch loop trains on (data, cached z) with SGD + WarmupMultiStepLR +
    grad-clip 10 (`ModelOptimizer`), ckpt every `ckpt_epochs`
  * loss dicts are median-smoothed and logged (TrainingStats analog)

The z-selection forward and the train step are each ONE jitted program;
the z-hypothesis axis is folded into the batch axis exactly like the
reference's repeat+view trick (`train.py:203-208`) but without host loops.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from google_nerf_tpu.depth.config import DepthCfg
from google_nerf_tpu.depth.losses import LossConfig, depth_losses
from google_nerf_tpu.depth.model import (DepthModelConfig, DepthNet,
                                         init_depth_model)
from google_nerf_tpu.depth.optim import (make_depth_optimizer,
                                         warmup_multistep_lr)


def model_config(cfg: DepthCfg, with_auxi: bool = False,
                 bn_axis_name=None) -> DepthModelConfig:
    site = "decoder" if cfg.model.cimle_version in ("v3", "v4", "v5", "v6") \
        else "encoder"
    return DepthModelConfig(backbone=cfg.model.encoder,
                            d_latent=cfg.model.d_latent, cimle_site=site,
                            with_auxi=with_auxi, bn_axis_name=bn_axis_name)


def loss_config(cfg: DepthCfg) -> LossConfig:
    return LossConfig(loss_mode=cfg.train.loss_mode,
                      loss_auxi_weight=cfg.train.loss_auxi_weight,
                      focal_x=cfg.dataset.focal_x,
                      focal_y=cfg.dataset.focal_y)


@dataclasses.dataclass
class DepthTrainState:
    variables: Dict[str, Any]
    opt_state: Any
    step: int = 0


def init_trainer(key, cfg: DepthCfg):
    mcfg = model_config(cfg)
    variables = init_depth_model(key, mcfg, cfg.dataset.crop_size)
    sched = warmup_multistep_lr(1.0, cfg.train.lr_milestones,
                                warmup_iters=cfg.train.warmup_iters)
    tx = make_depth_optimizer(
        variables["params"], cfg.train.base_lr,
        scale_decoder_lr=cfg.train.scale_decoder_lr,
        mlp_lr=cfg.train.mlp_lr, schedule=sched,
        fixed_backbone=cfg.model.freeze_backbone)
    return DepthTrainState(variables, tx.init(variables["params"])), tx, mcfg


def _forward_losses(variables, mcfg, lcfg, data, z, key, train: bool):
    model = DepthNet(mcfg)
    kwargs = dict(z=z) if mcfg.d_latent else {}
    if train:
        logit, updates = model.apply(variables, data["rgb"], train=True,
                                     mutable=["batch_stats"], **kwargs)
    else:
        logit, updates = model.apply(variables, data["rgb"], train=False,
                                     **kwargs), None
    pred = logit[..., 0]  # (B, H, W)
    losses = depth_losses(key, pred, data, lcfg)
    return losses, pred, updates


def make_zcache_fn(mcfg: DepthModelConfig, lcfg: LossConfig):
    """Jitted (variables, data, z (B, M, d), key) -> total_raw (B, M)."""

    @jax.jit
    def zcache(variables, data, z, key):
        b, m, d = z.shape
        rep = {k: jnp.repeat(v, m, axis=0) for k, v in data.items()}
        losses, _, _ = _forward_losses(variables, mcfg, lcfg, rep,
                                       z.reshape(b * m, d), key,
                                       train=False)
        return losses["total_raw"].reshape(b, m)

    return zcache


def make_train_step(tx, mcfg: DepthModelConfig, lcfg: LossConfig):
    @jax.jit
    def step(state_vars, opt_state, data, z, key):
        def loss_fn(params):
            variables = dict(state_vars, params=params)
            losses, pred, updates = _forward_losses(
                variables, mcfg, lcfg, data, z, key, train=True)
            return losses["total_loss"], (losses, updates)

        (loss, (losses, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state_vars["params"])
        upd, opt_state = tx.update(grads, opt_state, state_vars["params"])
        params = optax.apply_updates(state_vars["params"], upd)
        new_vars = dict(state_vars, params=params)
        if updates:
            new_vars["batch_stats"] = updates["batch_stats"]
        scalars = {k: v for k, v in losses.items()
                   if getattr(v, "ndim", 1) == 0}
        return new_vars, opt_state, scalars

    return step


def recache_z(key, state: DepthTrainState, sampler, cfg: DepthCfg,
              mcfg, lcfg, log=print) -> np.ndarray:
    """argmin-z selection over all images (`train.py:174-251`)."""
    t = cfg.train
    num_sets = t.num_latent // t.latent_minibatch
    zcache = make_zcache_fn(mcfg, lcfg)
    idxs = sampler.epoch_indices(0)
    selected = np.zeros((len(idxs), cfg.model.d_latent), np.float32)
    for i, (ds_i, it_i) in enumerate(idxs):
        item = sampler.datasets[ds_i].get_val(it_i)
        data = {k: jnp.asarray(v)[None] for k, v in item.items()}
        best_loss, best_z = np.inf, None
        for k in range(num_sets):
            kk = jax.random.fold_in(key, i * num_sets + k)
            z = jax.random.normal(kk, (1, t.latent_minibatch,
                                       cfg.model.d_latent))
            raw = np.asarray(zcache(state.variables, data, z,
                                    jax.random.fold_in(kk, 1)))[0]
            j = int(np.argmin(raw))
            if raw[j] < best_loss:
                best_loss, best_z = float(raw[j]), np.asarray(z[0, j])
        selected[i] = best_z
        if i % 100 == 0:
            log(f"z-cache {i}/{len(idxs)}")
    return selected


def train_depth(key, cfg: DepthCfg, sampler, epochs: Optional[int] = None,
                log=print, ckpt_fn: Optional[Callable] = None,
                resume: Optional[Dict[str, Any]] = None) -> DepthTrainState:
    """The full cIMLE loop (`do_train`).  `resume` is the dict written by
    depth_train.py's resumable checkpoint (variables/opt_state/step/epoch,
    matching the reference's `load_ckpt --resume`, net_tools.py:36-60)."""
    k_init, k_z, k_step = jax.random.split(key, 3)
    state, tx, mcfg = init_trainer(k_init, cfg)
    start_epoch = 0
    if resume is not None:
        state.variables = resume["variables"]
        state.opt_state = resume["opt_state"]
        state.step = int(resume["step"])
        start_epoch = int(resume["epoch"])
    lcfg = loss_config(cfg)
    step_fn = make_train_step(tx, mcfg, lcfg)
    t = cfg.train
    epochs = epochs if epochs is not None else t.epochs
    selected_z = None
    for epoch in range(start_epoch, epochs):
        if selected_z is None or epoch % t.recache_epochs == 0:
            log(f"epoch {epoch}: re-caching z")
            selected_z = recache_z(jax.random.fold_in(k_z, epoch), state,
                                   sampler, cfg, mcfg, lcfg, log=log)
        idx_of = {pair: i for i, pair in enumerate(sampler.epoch_indices(0))}
        t0 = time.time()
        for bi, batch in enumerate(sampler.batches(epoch, t.batch_size)):
            pairs = sampler.epoch_indices(epoch)[
                bi * t.batch_size:(bi + 1) * t.batch_size]
            z = jnp.asarray(np.stack([selected_z[idx_of[p]]
                                      for p in pairs]))
            data = {k: jnp.asarray(v) for k, v in batch.items()}
            state.variables, state.opt_state, scalars = step_fn(
                state.variables, state.opt_state, data, z,
                jax.random.fold_in(k_step, state.step))
            state.step += 1
            if state.step % t.log_interval == 0:
                msg = " ".join(f"{k}={float(v):.4g}"
                               for k, v in scalars.items())
                log(f"e{epoch} s{state.step} ({time.time()-t0:.1f}s) {msg}")
        if ckpt_fn is not None and (epoch + 1) % t.ckpt_epochs == 0:
            ckpt_fn(state, epoch)
    return state


def calibrate_adain(key, state: DepthTrainState, sampler, cfg: DepthCfg,
                    mcfg, n_batches: int = 4, n_z: int = 4):
    """AdaIN-statistic calibration (trainer v3/v4 variants,
    `Train/tools/train_v3.py` / `get_adain_init_act` +
    `set_mean_var_shifts`, `Resnext_torch.py:464-476`): estimate the
    per-channel mean and std of each AdaIN injection's activations over
    data and random z, and store them as the calibration shifts so the
    modulated activations start standardized."""
    from google_nerf_tpu.depth.model import (get_adain_init_act,
                                             set_mean_var_shifts)
    sums, sqs, count = None, None, 0
    idxs = sampler.epoch_indices(0)
    for b in range(min(n_batches, len(idxs))):
        ds_i, it_i = idxs[b]
        item = sampler.datasets[ds_i].get_val(it_i)
        rgb = jnp.asarray(item["rgb"])[None]
        for zi in range(n_z):
            z = jax.random.normal(jax.random.fold_in(key, b * 100 + zi),
                                  (1, cfg.model.d_latent))
            acts = get_adain_init_act(state.variables, mcfg, rgb, z)
            ch_means = [jnp.mean(a, axis=tuple(range(a.ndim - 1)))
                        for a in acts]
            ch_sqs = [jnp.mean(a ** 2, axis=tuple(range(a.ndim - 1)))
                      for a in acts]
            if sums is None:
                sums, sqs = ch_means, ch_sqs
            else:
                sums = [s + m for s, m in zip(sums, ch_means)]
                sqs = [s + m for s, m in zip(sqs, ch_sqs)]
            count += 1
    means = [np.asarray(s / count) for s in sums]
    variances = [np.asarray(jnp.sqrt(jnp.maximum(q / count - (s / count)
                                                 ** 2, 0.0)))
                 for s, q in zip(sums, sqs)]
    state.variables = set_mean_var_shifts(state.variables, means, variances)
    return state
