"""Depth-half performance measurement (VERDICT r4 item 8): one number
each for the cIMLE train step (img/s) and single-image inference latency
at the reference recipe shapes (resnext101 backbone, 448x448 crops,
batch 4 — LeReS `Train/tools/train.py` defaults).

Runs on whatever platform is live (the axon TPU chip when reachable;
set DEPTH_BENCH_CPU=1 to force CPU) and LABELS the platform in its
output — the reference publishes no depth perf numbers (BASELINE.json
`published: {}`), so this is the repo's own baseline row.

Timing law: chained dispatches + host scalar fetch (DESIGN_NOTES r8).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/depth_bench.py
"""
import functools
import os
import sys
import time

print = functools.partial(print, flush=True)


def main():
    import jax
    if os.environ.get("DEPTH_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from google_nerf_tpu.depth.config import DepthCfg
    from google_nerf_tpu.depth.model import depth_inference
    from google_nerf_tpu.depth.trainer import (init_trainer, loss_config,
                                               make_train_step,
                                               model_config)

    plat = jax.devices()[0].platform
    print(f"platform={plat} device={jax.devices()[0]}")
    cfg = DepthCfg()
    B = cfg.train.batch_size           # 4 (reference default)
    H, W = cfg.dataset.crop_size       # (448, 448)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, tx, mcfg = init_trainer(key, cfg)
    lcfg = loss_config(cfg)
    step = make_train_step(tx, mcfg, lcfg)
    print(f"init {time.time() - t0:.0f}s  encoder={cfg.model.encoder} "
          f"crop={H}x{W} batch={B} d_latent={cfg.model.d_latent}")

    data = dict(
        rgb=jax.random.uniform(jax.random.fold_in(key, 1), (B, H, W, 3)),
        depth=jax.random.uniform(jax.random.fold_in(key, 2), (B, H, W),
                                 minval=0.1, maxval=5.0),
    )
    z = jax.random.normal(jax.random.fold_in(key, 3),
                          (B, mcfg.d_latent))
    sv, opt = state.variables, state.opt_state

    t0 = time.time()
    sv, opt, scal = step(sv, opt, data, z, key)
    _ = float(scal["total_loss"])
    print(f"train step compile+first {time.time() - t0:.0f}s")
    n = 8
    t0 = time.time()
    for i in range(n):
        sv, opt, scal = step(sv, opt, data, z,
                             jax.random.fold_in(key, 10 + i))
    _ = float(scal["total_loss"])
    dt = (time.time() - t0) / n
    print(f"cimle_train_step: {dt * 1e3:.1f} ms/step = "
          f"{B / dt:.2f} img/s [{plat}]")

    # single-image inference (the Minist_Test path: depth_inference)
    rgb1 = data["rgb"][:1]
    z1 = z[:1]

    @jax.jit
    def infer(variables, rgb, zz):
        return depth_inference(variables, mcfg, rgb, z=zz)

    out = infer(sv, rgb1, z1)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = infer(sv, rgb1, z1)
    _ = float(jnp.asarray(out).ravel()[0])
    dt = (time.time() - t0) / n
    print(f"depth_inference_1x{H}x{W}: {dt * 1e3:.1f} ms [{plat}]")
    print("DEPTH BENCH DONE")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
