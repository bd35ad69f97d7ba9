"""Round-3 training-throughput A/B matrix (VERDICT r2 item 2: move
training from 0.16-0.19x toward >= 0.4x baseline).

Levers measured (one JSON line per variant, flush-printed so a partial
run still records everything it finished):
  * batch size      — rays/s is the metric; fixed overheads amortize and
                      sort/gather lanes fill at larger N
  * ms512 lattice   — half the samples/ray (round-4 probe: 1.6x step
                      throughput for ~1 dB at small scale; quality gate
                      here is PSNR@1024 on the bench protocol scene)
  * lev6 encoder    — -25% encode gather rows for -1.9 dB at small scale
                      (round-7 probe); chip step-time gain unknown

Timing law: chained steps + host scalar fetch (DESIGN_NOTES round 8).
Each variant trains 512 warmup steps (occupancy converges + compile),
then times 256 steps, then continues to 1024 total for the PSNR gate.
"""
import functools
import json
import sys
import time

import jax

print = functools.partial(print, flush=True)


def run_variant(name, *, batch=8192, k=256, ms=1024, lev=8, budget=None,
                n_keep_groups=0, march="block", encoder="packed",
                scan=0, gi=16, gdiv=4, tsize=16):
    import jax.numpy as jnp

    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              fused_train_steps,
                                              grid_update_step,
                                              init_train_state)
    model = NGPConfig(scale=0.5, encoder=encoder, grid_size=128,
                      packed_levels=lev, packed_log2_size=tsize,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=batch, k_samples=k,
                      max_samples=ms, num_epochs=30,
                      samples_budget=budget if budget is not None
                      else 16 * batch,
                      random_bg=True, exclude_incomplete="backfill",
                      march=march, n_keep_groups=n_keep_groups,
                      grid_update_interval=gi, grid_sample_div=gdiv)
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style="textured")
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)

    def loop(state, n, start):
        metrics = None
        if scan:  # one dispatch per `scan` steps (grid cadence outside)
            assert n % scan == 0 and start % scan == 0
            assert cfg.grid_update_interval % scan == 0 or \
                scan % cfg.grid_update_interval == 0
            for i in range(start, start + n, scan):
                if i % cfg.grid_update_interval == 0:
                    state = grid_update_step(
                        state, jax.random.fold_in(key, 2 * i + 1), cfg=cfg,
                        warmup=i < cfg.warmup_steps)
                state, metrics = fused_train_steps(
                    state, scene, jax.random.fold_in(key, 2 * i), cfg=cfg,
                    n_steps=scan)
            _ = float(jax.tree_util.tree_leaves(state)[0].ravel()[0])
            return state, metrics
        for i in range(start, start + n):
            if i % cfg.grid_update_interval == 0:
                state = grid_update_step(
                    state, jax.random.fold_in(key, 2 * i + 1), cfg=cfg,
                    warmup=i < cfg.warmup_steps)
            state, metrics = fused_train_step(
                state, scene, jax.random.fold_in(key, 2 * i), cfg=cfg)
        _ = float(jax.tree_util.tree_leaves(state)[0].ravel()[0])
        return state, metrics

    t0 = time.time()
    state, _ = loop(state, 512, 0)
    t_warm = time.time() - t0
    n_timed = 256
    t0 = time.time()
    state, metrics = loop(state, n_timed, 512)
    dt = time.time() - t0
    state, metrics = loop(state, 1024 - 512 - n_timed, 512 + n_timed)
    print(json.dumps({
        "variant": name, "batch": batch, "k": k, "ms": ms, "lev": lev,
        "ms_per_step": round(dt / n_timed * 1e3, 2),
        "rays_per_sec": round(n_timed * batch / dt, 1),
        "vs_baseline": round(n_timed * batch / dt / 819200, 3),
        "psnr_1024": round(float(metrics["psnr"]), 2),
        "s_per_ray": round(float(metrics["s_per_ray"]), 2),
        "mask_frac": round(float(metrics.get("mask_frac", 1.0)), 3),
        "warmup_s": round(t_warm, 1),
    }))


VARIANTS = {
    "base":        dict(),
    "b16k":        dict(batch=16384),
    "b32k":        dict(batch=32768),
    "ms512":       dict(ms=512, k=128),
    "lev6":        dict(lev=6),
    "b32k_ms512":  dict(batch=32768, ms=512, k=128),
    "b16k_ms512":  dict(batch=16384, ms=512, k=128),
    "b32k_ms512_lev6": dict(batch=32768, ms=512, k=128, lev=6),
    "b32k_ms512_bud12": dict(batch=32768, ms=512, k=128, budget=12 * 32768),
    # batch 2: marcher-table + per-ray-capacity levers
    "blk2":        dict(march="block2"),
    "blk2_b32k_ms512": dict(march="block2", batch=32768, ms=512, k=128),
    "k128":        dict(k=128),
    "b32k_k128":   dict(batch=32768, k=128),
    # VERDICT r2 item 5: reference-config shared-vertex hash encoder
    # (L=16/F=2/T=2^19, ngp_pl/models/networks.py:38-47) vs packed, at
    # the same step budget
    "hash":        dict(encoder="hash"),
    "hash_ms512":  dict(encoder="hash", ms=512, k=128),
    # round 4: ms512 at FULL per-ray capacity (k=256) — the r3 "ms512"
    # row conflated the lattice change with k=128's ~9 ms elsewhere.
    # budget scaled to the realized rows (~15 s_per_ray x batch):
    "ms512_k256":       dict(ms=512),
    "ms512_k256_bud12": dict(ms=512, budget=12 * 8192),
    "ms512_k256_bud10": dict(ms=512, budget=10 * 8192),
    # superlinear-batch re-check on the row-major separable plan (325884d)
    "b16k_r4":     dict(batch=16384),
    "b32k_r4":     dict(batch=32768),
    # mask_frac 0.908 A/B (VERDICT r3 item 8): does the ~9% excluded/
    # backfilled supervision at budget 16x bias held-out quality?  Raise
    # the budget so mask -> 1 and compare PSNR at equal steps.
    "bud20":       dict(budget=20 * 8192),
    "bud24":       dict(budget=24 * 8192),
    # r4 follow-ups on the winning ms512+bud12 recipe: shrink the padded
    # per-ray capacity (plan-sort rows = R*K) and the level count
    "ms512_k128_bud12": dict(ms=512, k=128, budget=12 * 8192),
    "ms512_k192_bud12": dict(ms=512, k=192, budget=12 * 8192),
    "ms512_k128_bud10": dict(ms=512, k=128, budget=10 * 8192),
    "lev6_ms512_bud12": dict(ms=512, lev=6, budget=12 * 8192),
    "b16k_ms512_k128_bud12": dict(batch=16384, ms=512, k=128,
                                  budget=12 * 16384),
    # r4: 16-step lax.scan per dispatch — amortize the ~10 ms/step host
    # dispatch gap the device-op trace exposed (tools/profile_train.py)
    "scan16_ms512_bud10": dict(ms=512, budget=10 * 8192, scan=16),
    "scan16_ms512_bud12": dict(ms=512, budget=12 * 8192, scan=16),
    # lev7: middle point between lev8 (183.6k @ 48.77) and lev6
    # (208.6k @ 46.49 — fails the >=48 gate)
    "scan16_lev7_ms512_bud10": dict(ms=512, lev=7, budget=10 * 8192,
                                    scan=16),
    "scan16_lev6_ms512_bud12": dict(ms=512, lev=6, budget=12 * 8192,
                                    scan=16),
    # r4: the ~10 ms/step non-device gap is the GRID UPDATE amortized
    # (every 16 steps; the device trace excluded it).  Same compiled
    # programs, host-side cadence only — interval is the free lever.
    # Reference uses S=16 (train.py:61); quality gate arbitrates.
    "gi32_ms512_bud10": dict(ms=512, budget=10 * 8192, gi=32),
    "gi64_ms512_bud10": dict(ms=512, budget=10 * 8192, gi=64),
    "lev7_ms512_bud10": dict(ms=512, lev=7, budget=10 * 8192),
    "gi64_lev7_ms512_bud10": dict(ms=512, lev=7, budget=10 * 8192, gi=64),
    # fewer grid-update density evals per call (reference m=G^3/4)
    "gdiv16_ms512_bud10": dict(ms=512, budget=10 * 8192, gdiv=16),
    "gi32_gdiv8_ms512_bud10": dict(ms=512, budget=10 * 8192, gi=32,
                                   gdiv=8),
    # lev6 quality recovery via table size: -25% encoder rows lost
    # 2.3 dB at T=2^16 — do collisions, not capacity, cost the dB?
    "lev6T17_gdiv16_ms512_bud12": dict(ms=512, lev=6, tsize=17,
                                       budget=12 * 8192, gdiv=16),
    "lev6T18_gdiv16_ms512_bud12": dict(ms=512, lev=6, tsize=18,
                                       budget=12 * 8192, gdiv=16),
    "bud8_gdiv16_ms512": dict(ms=512, budget=8 * 8192, gdiv=16),
    "bud7_gdiv16_ms512": dict(ms=512, budget=7 * 8192, gdiv=16),
    "bud6_gdiv16_ms512": dict(ms=512, budget=6 * 8192, gdiv=16),
    # coarser TRAIN lattice: ms256 halves marching candidates again;
    # the serving protocol renders at ms256 anyway — does train quality
    # survive sampling at the serving lattice?
    "ms256_bud7_gdiv16": dict(ms=256, budget=7 * 8192, gdiv=16),
    "ms256_bud6_gdiv16": dict(ms=256, budget=6 * 8192, gdiv=16),
    # ---- round 5: row-cutting levers on the r4 flagship recipe
    # (bud7_gdiv16_ms512 = bench.py config).  packed2 = paired-level
    # rows (ops/packed_pair.py, half the encoder gather rows); block2 =
    # the two-phase liveness-table marcher (~4x fewer march gather rows,
    # never flagshipped — VERDICT r4 item 6).
    "r5_head":    dict(ms=512, budget=7 * 8192, gdiv=16),
    "r5_p2":      dict(ms=512, budget=7 * 8192, gdiv=16,
                       encoder="packed2"),
    "r5_blk2":    dict(ms=512, budget=7 * 8192, gdiv=16, march="block2"),
    "r5_p2_blk2": dict(ms=512, budget=7 * 8192, gdiv=16,
                       encoder="packed2", march="block2"),
    # budget re-check at the cheaper step (saturation was at the OLD
    # per-row prices; a cheaper encoder may move the knee)
    "r5_p2_blk2_bud10": dict(ms=512, budget=10 * 8192, gdiv=16,
                             encoder="packed2", march="block2"),
    "r5_p2_bud10": dict(ms=512, budget=10 * 8192, gdiv=16,
                        encoder="packed2"),
    # pair-table size: the 140 B rows push a 2^16 table to 9.2 MiB —
    # out of the fast-cache gather regime (tools/microbench_pair.py);
    # 2^15/2^14 restore it at a capacity/quality risk the psnr gate
    # arbitrates.  t15 also probed for the packed encoder (sort-marker
    # count halves).
    "r5_p2_t15":  dict(ms=512, budget=7 * 8192, gdiv=16,
                       encoder="packed2", tsize=15),
    "r5_p2_t14":  dict(ms=512, budget=7 * 8192, gdiv=16,
                       encoder="packed2", tsize=14),
    "r5_p2_t14_blk2": dict(ms=512, budget=7 * 8192, gdiv=16,
                           encoder="packed2", tsize=14, march="block2"),
    "r5_head_t15": dict(ms=512, budget=7 * 8192, gdiv=16, tsize=15),
    # blk2 flagship follow-ups: the cheaper step may move the budget
    # knee down (encoder rows scale with budget), and k=192 shrinks the
    # padded per-ray plan rows
    "r5_blk2_bud6": dict(ms=512, budget=6 * 8192, gdiv=16,
                         march="block2"),
    "r5_blk2_bud8": dict(ms=512, budget=8 * 8192, gdiv=16,
                         march="block2"),
    "r5_blk2_k192": dict(ms=512, budget=7 * 8192, gdiv=16, k=192,
                         march="block2"),
    "r5_blk2_t15": dict(ms=512, budget=7 * 8192, gdiv=16, tsize=15,
                        march="block2"),
    "r5_blk2_b16k": dict(ms=512, budget=14 * 8192, gdiv=16,
                         batch=16384, march="block2"),
    "r5_blk2_b16k_t15": dict(ms=512, budget=14 * 8192, gdiv=16,
                             batch=16384, march="block2", tsize=15),
    "r5_blk2_b16k_bud12": dict(ms=512, budget=12 * 8192, gdiv=16,
                               batch=16384, march="block2"),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        t0 = time.time()
        try:
            run_variant(name, **VARIANTS[name])
        except Exception as e:  # noqa: BLE001 — matrix survives a variant
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"[:200],
                              "wall_s": round(time.time() - t0, 1)}))
    print("AB DONE")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
