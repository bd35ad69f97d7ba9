"""Depth-prior supervision e2e (VERDICT item 2 done-criterion): priors
flowing through the wired depth loss must change convergence."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from google_nerf_tpu.data.synthetic import SyntheticDataset
from google_nerf_tpu.models.ngp import NGPConfig
from google_nerf_tpu.train.system import (TrainConfig, init_train_state,
                                          run_training)


def _cfg(lambda_depth):
    model = NGPConfig(scale=0.5, encoder="packed", packed_levels=4,
                      packed_log2_size=12, grid_size=32)
    return TrainConfig(model=model, batch_size=1024, k_samples=32,
                       max_samples=128, lr=1e-2, num_epochs=1,
                       steps_per_epoch=150, warmup_steps=32,
                       lambda_depth=lambda_depth)


def _gt_depth(ds):
    """Analytic expected depth per train ray via dense integration."""
    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import _integrate_gt
    from google_nerf_tpu.ops.composite import composite_rays_train
    from google_nerf_tpu.ops.ray_aabb import clamp_near, ray_aabb_intersect
    from google_nerf_tpu.data.synthetic import analytic_field
    depths = []
    dirs = jnp.asarray(ds.directions)
    for p in ds.poses:
        o, d = get_rays(dirs, jnp.asarray(p))
        norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
        du = d / norm
        hits = clamp_near(ray_aabb_intersect(o, du, jnp.zeros(3),
                                             jnp.full((3,), 0.5)), 0.05)
        t1 = jnp.maximum(hits[:, 0], 0.0)
        t2 = jnp.where(hits[:, 1] > 0, hits[:, 1], t1)
        i = (jnp.arange(128) + 0.5) / 128
        ts = t1[:, None] + (t2 - t1)[:, None] * i[None, :]
        deltas = jnp.broadcast_to(((t2 - t1) / 128)[:, None], ts.shape)
        xyz = o[:, None] + ts[..., None] * du[:, None]
        sigma, rgb = analytic_field(xyz)
        valid = jnp.broadcast_to((hits[:, 0] >= 0)[:, None], ts.shape)
        out = composite_rays_train(sigma, rgb, deltas, ts, valid)
        depths.append(np.asarray(out["depth"]))
    return np.stack(depths).astype(np.float32)


@pytest.mark.slow
def test_depth_prior_supervision_changes_training():
    ds = SyntheticDataset(split="train", n_images=12, img_wh=(24, 24))
    depth_priors = _gt_depth(ds)
    assert depth_priors.shape == (12, 24 * 24)
    assert (depth_priors > 0).mean() > 0.2

    scene_plain = ds.scene()
    scene_depth = ds.scene(depths=jnp.asarray(depth_priors))
    assert "depths" in scene_depth

    cfg0 = _cfg(0.0)
    cfg1 = _cfg(0.5)
    s0 = init_train_state(jax.random.PRNGKey(0), cfg0, ds.K, ds.poses,
                          ds.img_wh)
    s1 = jax.tree.map(jnp.copy, s0)
    s0, m0 = run_training(s0, scene_plain, cfg0, steps=150)
    s1, m1 = run_training(s1, scene_depth, cfg1, steps=150)
    # both converge; the depth-supervised run actually used the prior
    assert float(m0["psnr"]) > 15
    assert float(m1["psnr"]) > 15
    t0 = np.asarray(s0["params"]["packed_table"])
    t1 = np.asarray(s1["params"]["packed_table"])
    assert not np.allclose(t0, t1)  # supervision altered optimization

    # the loss dict itself must carry the depth term when priors exist
    from google_nerf_tpu.train.losses import NeRFLoss
    loss = NeRFLoss(lambda_opacity=1e-3, lambda_depth=0.5)
    batch = {"rgb": jnp.zeros((8, 3)), "depth": jnp.ones((8,))}
    results = {"rgb": jnp.zeros((8, 3)), "opacity": jnp.ones((8,)) * 0.5,
               "depth": jnp.ones((8,)) * 2.0}
    d = loss(results, batch)
    assert "depth" in d
    total, _ = loss.total(results, batch)
    assert np.isfinite(float(total))
