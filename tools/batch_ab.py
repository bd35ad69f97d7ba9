"""A/B: training rays/s/chip vs config knobs at the flagship block-march
recipe — batch size, samples budget, encoder levels, table gather dtype,
grid-update cadence.

Variant spec (argv[1]): comma list of colon-separated key=value fields,
e.g. "b8192:bud98304,b8192:lev6,b8192:dtype=float8_e4m3fn,b8192:gi32".
Sampling-lattice knobs: k<k_samples> nk<n_keep> ms<max_samples>
(e.g. "b16384:ms512:k128:nk16:bud131072" — the cheap-lattice recipe from
DESIGN_NOTES round 4).  Bare "batch:budget" pairs (legacy) still work.

Each variant costs a fresh remote compile (minutes); keep the list short.
Prints ms/step, rays/s, vs-baseline, and train PSNR after an equal number
of RAYS (so variants see equal supervision).
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)

# AB_PRECOMPILE=1: compile the step + grid update, run 8 steps, print,
# exit — used to warm the (server-side, cross-process) compile cache for
# several variants IN PARALLEL when fresh compiles are slow; the timed
# serial pass then hits the cache.
PRECOMPILE = bool(os.environ.get("AB_PRECOMPILE"))


def run_variant(batch_size: int, budget: int, *, levels: int = 8,
                features: int = 2, table_dtype: str = "bfloat16",
                grid_interval: int = 16, log2_size: int = 19,
                style: str = "solid", rays_total: int = 2 ** 23,
                k_samples: int = 256, n_keep: int = 32,
                max_samples: int = 1024, march: str = "block",
                encoder: str = "packed"):
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    # lev/F/T map onto whichever encoder is selected: packed_* for the
    # flagship, num_levels/n_features/log2_hashmap_size for the
    # reference-capacity vertex-shared hash (enc=hash defaults to the
    # reference L16/T2^19 when lev/T are given explicitly)
    model = NGPConfig(scale=0.5, encoder=encoder, grid_size=128,
                      compute_dtype=jnp.bfloat16, packed_levels=levels,
                      packed_features=features,
                      packed_table_dtype=table_dtype,
                      packed_log2_size=log2_size,
                      num_levels=levels, n_features=features,
                      log2_hashmap_size=log2_size)
    cfg = TrainConfig(model=model, batch_size=batch_size,
                      k_samples=k_samples, n_keep=n_keep,
                      max_samples=max_samples,
                      num_epochs=30, samples_budget=budget, random_bg=True,
                      exclude_incomplete="backfill", march=march,
                      grid_update_interval=grid_interval)
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style=style)
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)

    n_steps = rays_total // batch_size
    warm = max(256, n_steps // 8)
    n_steps = max(n_steps, warm + 64)

    def loop(state, lo, hi, tail=None):
        # tail: collect per-step psnr/mask_frac over the last 128 steps —
        # single-step train psnr is several dB noisy across RNG-trajectory
        # changes (gi-cadence probe, DESIGN_NOTES round 7), so rank variants
        # by the tail mean instead.
        for i in range(lo, hi):
            if i % cfg.grid_update_interval == 0:
                state = grid_update_step(
                    state, jax.random.fold_in(key, 2 * i + 1), cfg=cfg,
                    warmup=i < cfg.warmup_steps)
            state, metrics = fused_train_step(
                state, scene, jax.random.fold_in(key, 2 * i), cfg=cfg)
            if tail is not None and i >= hi - 128:
                tail.append((metrics["psnr"], metrics.get(
                    "mask_frac", jnp.float32(1.0))))
        # true host fetch: block_until_ready can return early through the
        # axon relay (see tools/microbench_encoder_bwd3.py) — fetching a
        # scalar value cannot
        _ = float(jax.tree_util.tree_leaves(state)[0].ravel()[0])
        return state, metrics

    if PRECOMPILE:
        t0 = time.time()
        state, m = loop(state, 0, 8)
        # the steady-state (non-warmup) grid update is its own program
        state = grid_update_step(state, jax.random.fold_in(key, 9999),
                                 cfg=cfg, warmup=False)
        _ = float(jax.tree_util.tree_leaves(state)[0].ravel()[0])
        print(f"PRECOMPILED {sys.argv[1] if len(sys.argv) > 1 else ''} "
              f"in {time.time()-t0:.0f}s")
        return

    t0 = time.time()
    state, m = loop(state, 0, warm)
    t_compile_warm = time.time() - t0

    t0 = time.time()
    tail = []
    state, m = loop(state, warm, n_steps, tail=tail)
    dt = time.time() - t0
    rps = (n_steps - warm) * batch_size / dt
    psnr128 = float(jnp.mean(jnp.stack([p for p, _ in tail])))
    mask128 = float(jnp.mean(jnp.stack([f for _, f in tail])))
    print(f"b={batch_size} bud={budget} enc={encoder[:4]} "
          f"lev={levels} F={features} "
          f"dt={table_dtype[:6]} "
          f"gi={grid_interval} T=2^{log2_size} sty={style[:4]} "
          f"k={k_samples} nk={n_keep} ms={max_samples} mar={march}: "
          f"{dt / (n_steps - warm) * 1e3:6.1f} ms/step  "
          f"{rps:,.0f} rays/s ({rps / 819200:.3f}x)  "
          f"psnr128={psnr128:.2f} mask128={mask128:.3f} "
          f"s_per_ray={float(m['s_per_ray']):.1f}"
          f"  [warm+compile {t_compile_warm:.0f}s]")


def parse_variant(spec: str):
    kw = dict(batch_size=8192, budget=131072)
    parts = spec.split(":")
    # legacy "batch:budget"
    if all(p.isdigit() for p in parts) and len(parts) == 2:
        return dict(batch_size=int(parts[0]), budget=int(parts[1]))
    for p in parts:
        if p.startswith("dtype="):
            kw["table_dtype"] = p[6:]
        elif p.startswith("b") and p[1:].isdigit():
            kw["batch_size"] = int(p[1:])
        elif p.startswith("bud"):
            kw["budget"] = int(p[3:])
        elif p.startswith("lev"):
            kw["levels"] = int(p[3:])
        elif p.startswith("F") and p[1:].isdigit():
            kw["features"] = int(p[1:])
        elif p.startswith("gi"):
            kw["grid_interval"] = int(p[2:])
        elif p.startswith("T") and p[1:].isdigit():
            kw["log2_size"] = int(p[1:])
        elif p.startswith("sty="):
            kw["style"] = p[4:]
        elif p.startswith("k") and p[1:].isdigit():
            kw["k_samples"] = int(p[1:])
        elif p.startswith("nk"):
            kw["n_keep"] = int(p[2:])
        elif p.startswith("ms"):
            kw["max_samples"] = int(p[2:])
        elif p.startswith("mar="):
            kw["march"] = p[4:]
        elif p.startswith("enc="):
            kw["encoder"] = p[4:]
        else:
            raise ValueError(f"bad field {p!r} in {spec!r}")
    return kw


def main():
    if len(sys.argv) > 1:
        variants = [parse_variant(v) for v in sys.argv[1].split(",")]
    else:
        variants = [dict(batch_size=8192, budget=131072)]
    for kw in variants:
        run_variant(**kw)
    print("DONE")


if __name__ == "__main__":
    main()
