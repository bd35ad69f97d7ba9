"""Warm the persistent compile cache for queued A/B variants WITHOUT
touching the chip: jit(...).lower(abstract args).compile() populates the
cache (local .jax_cache + the remote compile service's), so the serial
harness later hits it instead of serializing 10-30 min fresh compiles.

Usage: python tools/precompile.py <variant> [...]   (names from
tools/r3_train_ab.VARIANTS, or "fps_train" for the fps_mxu train leg).
Run several in PARALLEL processes during a degraded-compile window —
compilation is server-side and cross-process (tools/batch_ab.py
AB_PRECOMPILE precedent).
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def precompile_train(name, *, batch=8192, k=256, ms=1024, lev=8,
                     budget=None, n_keep_groups=0, march="block",
                     num_epochs=30, encoder="packed", scan=0, gi=16,
                     gdiv=4, tsize=16):
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              fused_train_steps,
                                              grid_update_step,
                                              init_train_state)
    model = NGPConfig(scale=0.5, encoder=encoder, grid_size=128,
                      compute_dtype=jnp.bfloat16, packed_levels=lev,
                      packed_log2_size=tsize)
    cfg = TrainConfig(model=model, batch_size=batch, k_samples=k,
                      max_samples=ms, num_epochs=num_epochs,
                      samples_budget=budget if budget is not None
                      else 16 * batch,
                      random_bg=True, exclude_incomplete="backfill",
                      march=march, n_keep_groups=n_keep_groups,
                      grid_update_interval=gi, grid_sample_div=gdiv)
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style="textured")
    key = jax.random.PRNGKey(0)
    state_s = jax.eval_shape(
        lambda: init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh))
    scene_s = jax.eval_shape(ds.scene)
    key_s = jax.ShapeDtypeStruct(key.shape, key.dtype)
    steps = [("grid_warm", grid_update_step, dict(cfg=cfg, warmup=True)),
             ("grid", grid_update_step, dict(cfg=cfg, warmup=False)),
             ("step", fused_train_step, dict(cfg=cfg))]
    if scan:
        steps.append(("scan", fused_train_steps,
                      dict(cfg=cfg, n_steps=scan)))
    for label, fn, kw in steps:
        t0 = time.time()
        if fn is grid_update_step:
            fn.lower(state_s, key_s, **kw).compile()
        else:
            fn.lower(state_s, scene_s, key_s, **kw).compile()
        print(f"{name}:{label} compiled in {time.time() - t0:.0f}s")


def main():
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tools")
    from r3_train_ab import VARIANTS
    for name in sys.argv[1:]:
        t0 = time.time()
        try:
            if name == "fps_train":
                # tools/fps_mxu.py train leg: seg marcher, num_epochs=4
                precompile_train(name, march="seg", num_epochs=4)
            else:
                precompile_train(name, **VARIANTS[name])
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}"[:300])
        print(f"{name}: done in {time.time() - t0:.0f}s")
    print("PRECOMPILE DONE")


if __name__ == "__main__":
    main()
