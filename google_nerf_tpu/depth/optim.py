"""Optimizers + LR schedules for the depth models.

TPU-native rebuild of
`Train/lib/models/multi_depth_model_auxiv2.py:359-466` (ModelOptimizer /
ModelOptimizer_AdaIn: SGD momentum 0.9, weight decay 5e-4, split
encoder/decoder/style-MLP LRs, grad-norm clip 10) and
`Train/lib/utils/lr_scheduler_custom.py:4-55` (WarmupMultiStepLR: linear
warmup then x0.1 at milestones).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import optax


def warmup_multistep_lr(base_lr: float, milestones: Sequence[int],
                        gamma: float = 0.1, warmup_factor: float = 1.0 / 3,
                        warmup_iters: int = 500,
                        warmup_method: str = "linear"):
    """`WarmupMultiStepLR` (`lr_scheduler_custom.py:4-55`) as an optax
    schedule: lr(step) = base * warmup(step) * gamma^#(milestones <= step)."""
    milestones = sorted(milestones)

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step)
        if warmup_method == "constant":
            wf = jnp.where(step < warmup_iters, warmup_factor, 1.0)
        else:
            alpha = jnp.minimum(step / max(warmup_iters, 1), 1.0)
            wf = jnp.where(step < warmup_iters,
                           warmup_factor * (1 - alpha) + alpha, 1.0)
        n_hit = sum((step >= m).astype(jnp.int32) for m in milestones)
        return base_lr * wf * gamma ** n_hit

    return schedule


def _param_group(path) -> str:
    """Reference grouping (`multi_depth_model_auxiv2.py:404-419`):
    'style' in name -> style MLP group; 'encoder' -> encoder; else decoder."""
    name = "/".join(str(p) for p in path)
    if "style" in name:
        return "style"
    if "encoder" in name or "res" in name:
        return "encoder"
    return "decoder"


def make_depth_optimizer(params, base_lr: float,
                         scale_decoder_lr: float = 1.0,
                         mlp_lr: Optional[float] = None,
                         weight_decay: float = 5e-4,
                         momentum: float = 0.9,
                         clip_norm: float = 10.0,
                         fixed_backbone: bool = False,
                         schedule=None):
    """SGD with per-group LRs + global grad-norm clip.

    schedule: optional multiplicative schedule(step) in [0, 1]-ish applied
    to every group (pass `warmup_multistep_lr(1.0, ...)` for reference
    semantics with base lrs baked into the groups)."""
    mlp_lr = base_lr if mlp_lr is None else mlp_lr

    def sgd(lr):
        mult = schedule if schedule is not None else (lambda _: 1.0)
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(lambda s: lr * mult(s), momentum=momentum),
        )

    lrs = {"encoder": 0.0 if fixed_backbone else base_lr,
           "decoder": 0.0 if fixed_backbone else base_lr * scale_decoder_lr,
           "style": mlp_lr}
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _param_group(path), params)
    tx = optax.multi_transform({k: sgd(v) for k, v in lrs.items()}, labels)
    return optax.chain(optax.clip_by_global_norm(clip_norm), tx)
