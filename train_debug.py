"""Single-step debug trainer (reference `ngp_pl/train_mika.py:119-173`:
an explicit non-framework loop that runs a few steps with verbose prints
and exits — used to inspect shapes/values when bringing up a change).

python train_debug.py --dataset_name synthetic --root_dir x --steps 3
"""
from __future__ import annotations

import time

import numpy as np

from opt import get_opts
from train import apply_platform, build_configs, dataset_kwargs


def main(hparams):
    apply_platform(hparams)
    import jax
    import jax.numpy as jnp

    from google_nerf_tpu.data import dataset_dict
    from google_nerf_tpu.train.system import (fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    steps = getattr(hparams, "steps", 3)
    ds = dataset_dict[hparams.dataset_name](
        hparams.root_dir, split=hparams.split,
        downsample=hparams.downsample, **dataset_kwargs(hparams))
    cfg = build_configs(hparams)
    print(f"dataset: {len(ds.poses)} poses, img_wh={ds.img_wh}, "
          f"rays={getattr(ds.rays, 'shape', None)}")
    print(f"config: {cfg}")

    key = jax.random.PRNGKey(hparams.seed)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    print("state leaves:")
    for path, leaf in jax.tree_util.tree_flatten_with_path(state)[0]:
        name = "/".join(str(p) for p in path)
        print(f"  {name}: {getattr(leaf, 'shape', ())} "
              f"{getattr(leaf, 'dtype', '')}")

    scene = ds.scene()
    for i in range(steps):
        t0 = time.time()
        if i % cfg.grid_update_interval == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 2*i+1),
                                     cfg=cfg, warmup=i < cfg.warmup_steps)
            occ = float(jnp.mean(state["occ"].astype(jnp.float32)))
            print(f"[step {i}] grid update: occ_frac={occ:.4f}")
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, 2*i),
                                          cfg=cfg)
        jax.block_until_ready(metrics)
        print(f"[step {i}] " + " ".join(
            f"{k}={float(v):.5g}" for k, v in metrics.items())
            + f" ({time.time()-t0:.2f}s)")
    tbl = state["params"].get("packed_table",
                              state["params"].get("hash_table"))
    if tbl is not None:
        print(f"table stats: mean|w|={float(jnp.abs(tbl).mean()):.3e} "
              f"max|w|={float(jnp.abs(tbl).max()):.3e}")
    print("debug run complete (exiting, as the reference does)")


if __name__ == "__main__":
    import argparse
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--steps", type=int, default=3)
    known, rest = parser.parse_known_args()
    hp = get_opts(rest)
    hp.steps = known.steps
    main(hp)
