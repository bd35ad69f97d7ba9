"""Render-time occupancy threshold sweep: PSNR + FPS at 800^2 as a function
of the density threshold used to build the RENDER bitfield (train grid
unchanged)."""
import functools, time
import jax, jax.numpy as jnp, numpy as np
print = functools.partial(print, flush=True)

from google_nerf_tpu.core.rays import get_ray_directions, get_rays
from google_nerf_tpu.data.synthetic import SyntheticDataset
from google_nerf_tpu.eval.metrics import psnr
from google_nerf_tpu.models.ngp import NGPConfig
from google_nerf_tpu.models.render_test_fast import render_test_fast
from google_nerf_tpu.ops.grid import pack_occupancy_u8
from google_nerf_tpu.ops.march_seg import required_dilation_radius
from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                          grid_update_step, init_train_state)

model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                  compute_dtype=jnp.bfloat16)
cfg = TrainConfig(model=model, batch_size=8192, k_samples=64,
                  num_epochs=3, samples_budget=131072)
ds = SyntheticDataset(split="train", n_images=64, img_wh=(256, 256))
scene = ds.scene()
key = jax.random.PRNGKey(0)
state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
for i in range(3000):
    if i % 16 == 0:
        state = grid_update_step(state, jax.random.fold_in(key, 2*i+1),
                                 cfg=cfg, warmup=i < cfg.warmup_steps)
    state, metrics = fused_train_step(state, scene,
                                      jax.random.fold_in(key, 2*i), cfg=cfg)
jax.block_until_ready(state)
print(f"trained: psnr={float(metrics['psnr']):.2f} "
      f"s_per_ray={float(metrics['s_per_ray']):.1f}")

# quality reference view at 256^2 + FPS at 800^2
ds_t = SyntheticDataset(split="test", n_images=2, img_wh=(256, 256))
dirs_t = jnp.asarray(ds_t.directions)
w = h = 800
K800 = jnp.asarray([[w*1.1, 0, w/2], [0, w*1.1, h/2], [0, 0, 1]])
dirs800 = get_ray_directions(h, w, K800)
o8, d8 = get_rays(dirs800, jnp.broadcast_to(jnp.asarray(ds.poses[0]),
                                            (h*w, 3, 4)))
r1 = required_dilation_radius(8, 128, 1024, 0.5)
for thr in [None, 10.0, 20.0, 40.0, 80.0]:
    if thr is None:
        occ = state["occ"]
        label = "train-grid"
    else:
        occ = (state["density_grid"] > thr) & (state["occ"])
        label = f"thr={thr}"
    occ_u8 = pack_occupancy_u8(occ, r1)
    frac = float(jnp.mean(occ.astype(jnp.float32)))
    ps = []
    for vi in range(2):
        o, d = get_rays(dirs_t, jnp.asarray(ds_t.poses[vi]))
        out = render_test_fast(state["params"], cfg.model, occ_u8, o, d,
                               chunk=dirs_t.shape[0], T_threshold=1e-2)
        ps.append(float(psnr(out["rgb"], jnp.asarray(ds_t.rays[vi]))))
    f = lambda: render_test_fast(state["params"], cfg.model, occ_u8,
                                 o8, d8, T_threshold=1e-2)["rgb"]
    out = f(); jax.block_until_ready(out)
    t0 = time.time()
    outs = [f() for _ in range(2)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / 2
    print(f"{label}: occ={frac:.3f} test_psnr={np.mean(ps):.2f} "
          f"({ps[0]:.1f}/{ps[1]:.1f}) fps800={1/dt:.2f}")
