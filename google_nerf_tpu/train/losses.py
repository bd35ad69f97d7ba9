"""Training losses.

Rebuild of reference `ngp_pl/losses.py`:
  * RGB MSE + opacity entropy (lambda 1e-3)          losses.py:32-40
  * shift/scale-invariant disparity loss (MiDaS eq.) losses.py:5-23 — defined
    but UNWIRED in the reference; here it is a first-class depth-prior loss
    (SURVEY.md §0 "fork-specific deviations"), enabled via lambda_depth > 0
    using the renderer's per-ray depth output.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def shiftscale_inv_depthloss(disp_pred, disp_gt):
    """Per-sample MiDaS shift/scale-invariant disparity loss (N,) -> (N,)."""
    t_pred = jnp.median(disp_pred)
    s_pred = jnp.mean(jnp.abs(disp_pred - t_pred))
    t_gt = jnp.median(disp_gt)
    s_gt = jnp.mean(jnp.abs(disp_gt - t_gt))
    pred_n = (disp_pred - t_pred) / jnp.maximum(s_pred, 1e-8)
    gt_n = (disp_gt - t_gt) / jnp.maximum(s_gt, 1e-8)
    return (pred_n - gt_n) ** 2


@dataclasses.dataclass(frozen=True)
class NeRFLoss:
    lambda_opacity: float = 1e-3
    lambda_depth: float = 0.0

    def __call__(self, results, batch):
        d = {}
        d["rgb"] = (results["rgb"] - batch["rgb"]) ** 2
        # clamp: compositing in f32 can round opacity epsilon-negative,
        # and log(<=0) would NaN the whole sigma/table gradient
        o = jnp.clip(results["opacity"], 0.0, 1.0) + 1e-10
        d["opacity"] = self.lambda_opacity * (-o * jnp.log(o))
        if self.lambda_depth > 0 and "depth" in batch:
            # supervise rendered depth against the (monocular) depth prior in
            # disparity space; only rays with a valid prior (> 0) contribute.
            valid = batch["depth"] > 0
            disp_pred = 1.0 / jnp.maximum(results["depth"], 1e-6)
            disp_gt = 1.0 / jnp.maximum(batch["depth"], 1e-6)
            loss = shiftscale_inv_depthloss(
                jnp.where(valid, disp_pred, 0.0),
                jnp.where(valid, disp_gt, 0.0))
            d["depth"] = self.lambda_depth * jnp.where(valid, loss, 0.0)
        return d

    def total(self, results, batch):
        """Mean over rays; rays whose render was truncated by the sample
        budget (results["ray_mask"] False) are excluded so truncation never
        biases gradients — it only shrinks the effective batch."""
        d = self(results, batch)
        mask = results.get("ray_mask")
        if mask is None:
            return sum(v.mean() for v in d.values()), d
        denom = jnp.maximum(mask.sum(), 1)

        def ray_mean(v):
            m = mask.reshape((-1,) + (1,) * (v.ndim - 1))
            return jnp.sum(jnp.where(m, v, 0.0)) / (
                denom * (v[0].size if v.ndim > 1 else 1))

        return sum(ray_mean(v) for v in d.values()), d
