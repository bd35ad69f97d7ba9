"""Front-to-back volume compositing over padded (R, K) sample grids.

TPU-native replacement for `vren.composite_train_fw/bw` and
`vren.composite_test_fw` (wrappers `ngp_pl/models/custom_functions.py:116-159`,
call site `ngp_pl/models/rendering.py:97-100,155-157`).

Math: with s_i = sigma_i * delta_i, transmittance before sample i is
T_i = exp(-sum_{j<i} s_j) (an exclusive cumsum — exactly vren's running
product of (1 - alpha_j) since 1 - alpha_j = exp(-s_j)).  A sample
contributes iff it is valid and T_i > T_threshold, reproducing vren's early
break after T drops below threshold.  Weights w_i = T_i * alpha_i.

Gradients flow through the smooth masked expression via XLA autodiff; the
threshold mask is a hard boundary exactly as in vren's hand-written backward.
"""
from __future__ import annotations

import jax.numpy as jnp


def _exclusive_cumsum(x, axis=-1):
    cs = jnp.cumsum(x, axis=axis)
    return cs - x


def composite_rays_train(sigmas, rgbs, deltas, ts, valid, T_threshold=1e-4):
    """Composite padded samples to per-ray outputs.

    sigmas (R, K), rgbs (R, K, 3), deltas (R, K), ts (R, K), valid (R, K).
    Returns dict: opacity (R,), depth (R,), depth_sq (R,), rgb (R, 3),
    ws (R, K) sample weights.
    """
    sd = jnp.where(valid, sigmas * deltas, 0.0)
    T_before = jnp.exp(-_exclusive_cumsum(sd))
    alpha = 1.0 - jnp.exp(-sd)
    include = valid & (T_before > T_threshold)
    w = jnp.where(include, T_before * alpha, 0.0)
    opacity = w.sum(-1)
    depth = (w * ts).sum(-1)
    depth_sq = (w * ts * ts).sum(-1)
    rgb = (w[..., None] * rgbs).sum(-2)
    return dict(opacity=opacity, depth=depth, depth_sq=depth_sq, rgb=rgb,
                ws=w)


def composite_rays_test_round(sigmas, rgbs, deltas, ts, valid, T_carry,
                              opacity, depth, rgb, T_threshold=1e-4):
    """Incremental compositing for one test-time marching round.

    T_carry (R,) is the transmittance accumulated by previous rounds;
    opacity/depth/rgb are running accumulators.  Returns updated
    (T, opacity, depth, rgb).  A ray is converged when T <= T_threshold.
    """
    sd = jnp.where(valid, sigmas * deltas, 0.0)
    T_before = T_carry[:, None] * jnp.exp(-_exclusive_cumsum(sd))
    alpha = 1.0 - jnp.exp(-sd)
    include = valid & (T_before > T_threshold)
    w = jnp.where(include, T_before * alpha, 0.0)
    opacity = opacity + w.sum(-1)
    depth = depth + (w * ts).sum(-1)
    rgb = rgb + (w[..., None] * rgbs).sum(-2)
    T_new = T_carry * jnp.exp(-jnp.where(include, sd, 0.0).sum(-1))
    return T_new, opacity, depth, rgb
