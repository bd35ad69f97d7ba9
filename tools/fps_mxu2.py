"""MXU brick-renderer sweep with a CACHE-FRIENDLY train leg.

tools/fps_mxu.py trains a shell scene with its own config — fresh train
programs, which cost 20-30 min EACH in a degraded compile window.  This
variant trains the TEXTURED scene with the exact bench.py/base-A/B config
(same HLO -> persistent-cache hit), saves the state to /tmp, then sweeps
the MXU renderer variants given on argv, e.g.:

  python tools/fps_mxu2.py tp4 tp8 t

Each variant is ONE fresh jit program (_mxu_tiles); everything else is
cached.  Prints one line per variant + DONE.
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)

VARIANTS = {
    "tp4": dict(kernel="tp", pbatch=4),
    # round 4 (tools/kernel_cost_probe.py findings): bf16 slabs DMA ~1.8x
    # faster than fp8 (1-byte dtype pays a repack), P=1 beats P=8 on both
    # the miss floor (0.50 vs 2.49 us/slot) and the forced body (1.57 vs
    # 4.57); segment_slots elides slab DMAs behind saturated tiles
    "t_bf16":        dict(kernel="t", pool_dtype="bfloat16"),
    "t_ms256_bf16":  dict(kernel="t", pool_dtype="bfloat16",
                          max_samples=256),
    "tp4_ms256_bf16": dict(kernel="tp", pbatch=4, pool_dtype="bfloat16",
                           max_samples=256),
    "tp4seg8_ms256_bf16": dict(kernel="tp", pbatch=4,
                               pool_dtype="bfloat16", max_samples=256,
                               segment_slots=8),
    "tp4seg8_bf16": dict(kernel="tp", pbatch=4, pool_dtype="bfloat16",
                         segment_slots=8),
    "tp4seg16_ms256_bf16": dict(kernel="tp", pbatch=4,
                                pool_dtype="bfloat16", max_samples=256,
                                segment_slots=16),
    "tp1seg8_ms256_bf16": dict(kernel="tp", pbatch=1,
                               pool_dtype="bfloat16", max_samples=256,
                               segment_slots=8),
    # pre-shaded rgba slabs (models/baked_rgba.py): 4x fewer slab bytes,
    # no in-kernel MLP; the per-frame bake runs INSIDE frame() so its
    # cost is part of the measured FPS
    "rgba_ms256": dict(kernel="rgba", pool_dtype="bfloat16",
                       max_samples=256),
    "rgba_seg8_ms256": dict(kernel="rgba", pool_dtype="bfloat16",
                            max_samples=256, segment_slots=8),
    "rgba_seg8": dict(kernel="rgba", pool_dtype="bfloat16",
                      segment_slots=8),
    # round 4b: the frame cost is ~1.6 us x GRID-STEP count (fps_r4c
    # telemetry arithmetic); cut steps — P=8, drain sized to the ~8
    # needy tiles/chunk actually observed (256-tile static drains were
    # ~327k steps/frame, 6x the main pass)
    "tp8_ms256_bf16": dict(kernel="tp", pbatch=8, pool_dtype="bfloat16",
                           max_samples=256),
    "tp8_ms256_bf16_d32": dict(kernel="tp", pbatch=8,
                               pool_dtype="bfloat16", max_samples=256,
                               drain_tiles=32, drain_L=128),
    # round 4c: bands save 2x on main steps but force 16k-step drains
    # (the r4d quality collapse at drain_tiles=32).  FLAT full-L lists
    # need draining only for true list overflow (t_rel > 64: ~24 tiles/
    # frame) — small drains suffice and exactness returns.
    "tp8_ms256_bf16_nb_d32": dict(kernel="tp", pbatch=8,
                                  pool_dtype="bfloat16", max_samples=256,
                                  bands=(), drain_tiles=32, drain_L=128),
    "tp8_ms256_bf16_nb_d64": dict(kernel="tp", pbatch=8,
                                  pool_dtype="bfloat16", max_samples=256,
                                  bands=(), drain_tiles=64, drain_L=128),
    "tp16_ms256_bf16_nb_d32": dict(kernel="tp", pbatch=16,
                                   pool_dtype="bfloat16",
                                   max_samples=256, bands=(),
                                   drain_tiles=32, drain_L=128),
    "tp8seg8_ms256_bf16_nb_d32": dict(kernel="tp", pbatch=8,
                                      pool_dtype="bfloat16",
                                      max_samples=256, segment_slots=8,
                                      drain_tiles=32, drain_L=128),
    "tp8_ms512_bf16_nb_d32": dict(kernel="tp", pbatch=8,
                                  pool_dtype="bfloat16", max_samples=512,
                                  bands=(), drain_tiles=32, drain_L=128),
    # round 4d: ~90 tiles/chunk truly exceed L=64 (some exceed 256) —
    # the drain must be sized for that, and seg8+flat+P8 is the fast
    # base (332 ms).  Restore exactness with a right-sized drain.
    "tp8seg8_ms256_bf16_d128L256": dict(
        kernel="tp", pbatch=8, pool_dtype="bfloat16", max_samples=256,
        segment_slots=8, drain_tiles=128, drain_L=256),
    "tp8seg8_ms256_bf16_d96L192": dict(
        kernel="tp", pbatch=8, pool_dtype="bfloat16", max_samples=256,
        segment_slots=8, drain_tiles=96, drain_L=192),
    "tp8seg8_ms512_bf16_d128L256": dict(
        kernel="tp", pbatch=8, pool_dtype="bfloat16", max_samples=512,
        segment_slots=8, drain_tiles=128, drain_L=256),
    "tp4seg8_ms256_bf16_d128L256": dict(
        kernel="tp", pbatch=4, pool_dtype="bfloat16", max_samples=256,
        segment_slots=8, drain_tiles=128, drain_L=256),
    # round 4e: exact per-ray hit filter — wide 192-candidate lists
    # compacted to the TRUE-hit slots (eps-free; phantom margin bricks
    # never reach the kernel), drains only for genuine deep tiles
    "tp8xc48_ms256_bf16": dict(kernel="tp", pbatch=8,
                               pool_dtype="bfloat16", max_samples=256,
                               L=192, exact_cull=48, segment_slots=8,
                               drain_tiles=32, drain_L=256),
    "tp8xc32_ms256_bf16": dict(kernel="tp", pbatch=8,
                               pool_dtype="bfloat16", max_samples=256,
                               L=192, exact_cull=32, segment_slots=8,
                               drain_tiles=64, drain_L=256),
    "tp8xc48_ms512_bf16": dict(kernel="tp", pbatch=8,
                               pool_dtype="bfloat16", max_samples=512,
                               L=192, exact_cull=48, segment_slots=8,
                               drain_tiles=32, drain_L=256),
    "tp8xc48_ms256_bf16_noseg": dict(kernel="tp", pbatch=8,
                                     pool_dtype="bfloat16",
                                     max_samples=256, L=192,
                                     exact_cull=48, bands=(),
                                     drain_tiles=32, drain_L=256),
    # front-end floor probe: L=8 lists, no drain — frame time ~= cull/
    # glue cost + a ~30ms kernel, bounding the non-kernel share
    "tp8_L8_front": dict(kernel="tp", pbatch=8, pool_dtype="bfloat16",
                         max_samples=256, bands=(), L=8, drain_tiles=0),
    "tp8_L8_front_nomacro": dict(kernel="tp", pbatch=8,
                                 pool_dtype="bfloat16", max_samples=256,
                                 bands=(), L=8, drain_tiles=0,
                                 macro_tiles=0),
    "tp8_L8_front_mL512": dict(kernel="tp", pbatch=8,
                               pool_dtype="bfloat16", max_samples=256,
                               bands=(), L=8, drain_tiles=0,
                               macro_L=512),
    "tp8_L8_front_mL256": dict(kernel="tp", pbatch=8,
                               pool_dtype="bfloat16", max_samples=256,
                               bands=(), L=8, drain_tiles=0,
                               macro_L=256),
    "tp8_L8_front_c1k": dict(kernel="tp", pbatch=8,
                             pool_dtype="bfloat16", max_samples=256,
                             bands=(), L=8, drain_tiles=0,
                             chunk_tiles=1024),
    "tp8_L8_front_mt16": dict(kernel="tp", pbatch=8,
                              pool_dtype="bfloat16", max_samples=256,
                              bands=(), L=8, drain_tiles=0,
                              macro_tiles=16),
    # full exact pipeline with banded true-hit scheduling + exact drain
    "tp8xc48b_ms256_bf16": dict(kernel="tp", pbatch=8,
                                pool_dtype="bfloat16", max_samples=256,
                                L=192, exact_cull=48, bands="auto",
                                drain_tiles=256, drain_L=256,
                                drain_xc=96),
    "tp8xc48f_ms256_bf16": dict(kernel="tp", pbatch=8,
                                pool_dtype="bfloat16", max_samples=256,
                                L=192, exact_cull=48, segment_slots=8,
                                drain_tiles=256, drain_L=256,
                                drain_xc=96),
    # r4 P-batch x exact-cull interaction: the kernel-cost probe ranks
    # P=1 bodies ~3x cheaper than P=8's, but P-batching was only ever
    # chip-raced on SPARSE lists; exact-culled lists are DENSE true
    # hits, so the body (not the DMA miss floor) should dominate
    "tp4xc48f_ms256_bf16": dict(kernel="tp", pbatch=4,
                                pool_dtype="bfloat16", max_samples=256,
                                L=192, exact_cull=48, segment_slots=8,
                                drain_tiles=256, drain_L=256,
                                drain_xc=96),
    "tp2xc48f_ms256_bf16": dict(kernel="tp", pbatch=2,
                                pool_dtype="bfloat16", max_samples=256,
                                L=192, exact_cull=48, segment_slots=8,
                                drain_tiles=256, drain_L=256,
                                drain_xc=96),
    "t_xc48f_ms256_bf16": dict(kernel="t",
                               pool_dtype="bfloat16", max_samples=256,
                               L=192, exact_cull=48,
                               drain_tiles=256, drain_L=256,
                               drain_xc=96),
    "tp8xc32f_ms256_bf16": dict(kernel="tp", pbatch=8,
                                pool_dtype="bfloat16", max_samples=256,
                                L=192, exact_cull=32, segment_slots=8,
                                drain_tiles=256, drain_L=256,
                                drain_xc=96),
    "tp4xc32f_ms256_bf16": dict(kernel="tp", pbatch=4,
                                pool_dtype="bfloat16", max_samples=256,
                                L=192, exact_cull=32, segment_slots=8,
                                drain_tiles=256, drain_L=256,
                                drain_xc=96),
    # coarser serving bake: 256^3 voxels -> ~8x fewer bricks, ~4x fewer
    # (tile, brick) slots — the slot-count ceiling analysis (R4.5) says
    # slot count is the ONLY big lever left; measures the quality price
    "tp8xc48f_v256_ms256_bf16": dict(kernel="tp", pbatch=8,
                                     pool_dtype="bfloat16", voxel_res=256,
                                     max_samples=256, L=96, exact_cull=48,
                                     segment_slots=8, drain_tiles=256,
                                     drain_L=256, drain_xc=96),
    "tp4xc24f_v256_ms128_bf16": dict(kernel="tp", pbatch=4,
                                     pool_dtype="bfloat16", voxel_res=256,
                                     max_samples=128, L=96, exact_cull=24,
                                     segment_slots=8, drain_tiles=256,
                                     drain_L=256, drain_xc=48),
    # v256 champion follow-ups (3.27 FPS @ 42.51, 0 undrained): shrink
    # the front-end share (chunk 1024), cull cap, and resolution further
    "tp8xc48f_v256_c1k": dict(kernel="tp", pbatch=8,
                              pool_dtype="bfloat16", voxel_res=256,
                              max_samples=256, L=96, exact_cull=48,
                              segment_slots=8, drain_tiles=256,
                              drain_L=256, drain_xc=96,
                              chunk_tiles=1024),
    "tp8xc32f_v256": dict(kernel="tp", pbatch=8,
                          pool_dtype="bfloat16", voxel_res=256,
                          max_samples=256, L=96, exact_cull=32,
                          segment_slots=8, drain_tiles=256,
                          drain_L=256, drain_xc=96),
    "tp8xc48f_v256_ms512": dict(kernel="tp", pbatch=8,
                                pool_dtype="bfloat16", voxel_res=256,
                                max_samples=512, L=96, exact_cull=48,
                                segment_slots=8, drain_tiles=256,
                                drain_L=256, drain_xc=96),
    "tp8xc24f_v128_ms128": dict(kernel="tp", pbatch=8,
                                pool_dtype="bfloat16", voxel_res=128,
                                max_samples=128, L=64, exact_cull=24,
                                segment_slots=8, drain_tiles=256,
                                drain_L=256, drain_xc=48),
    "tp8xc48f_v256_seg16": dict(kernel="tp", pbatch=8,
                                pool_dtype="bfloat16", voxel_res=256,
                                max_samples=256, L=96, exact_cull=48,
                                segment_slots=16, drain_tiles=256,
                                drain_L=256, drain_xc=96),
    # v256 drain diet: the frame trace shows the drain cond at ~75 ms of
    # the 229 ms device frame (it fires for tiles with 48<nhits<=96 and
    # renders the full 256-tile drain grid for them)
    "tp8xc48f_v256_d64": dict(kernel="tp", pbatch=8,
                              pool_dtype="bfloat16", voxel_res=256,
                              max_samples=256, L=96, exact_cull=48,
                              segment_slots=8, drain_tiles=64,
                              drain_L=128, drain_xc=96),
    "tp8xc48f_v256_d32": dict(kernel="tp", pbatch=8,
                              pool_dtype="bfloat16", voxel_res=256,
                              max_samples=256, L=96, exact_cull=48,
                              segment_slots=8, drain_tiles=32,
                              drain_L=128, drain_xc=96),
    "tp8xc64f_v256": dict(kernel="tp", pbatch=8,
                          pool_dtype="bfloat16", voxel_res=256,
                          max_samples=256, L=96, exact_cull=64,
                          segment_slots=8, drain_tiles=64,
                          drain_L=128, drain_xc=96),
    "tp8xc96f_v256": dict(kernel="tp", pbatch=8,
                          pool_dtype="bfloat16", voxel_res=256,
                          max_samples=256, L=96, exact_cull=96,
                          segment_slots=8, drain_tiles=32,
                          drain_L=128, drain_xc=96),
    "tp16xc96f_v256": dict(kernel="tp", pbatch=16,
                           pool_dtype="bfloat16", voxel_res=256,
                           max_samples=256, L=96, exact_cull=96,
                           segment_slots=16, drain_tiles=32,
                           drain_L=128, drain_xc=96),
    "tp8xc96_v256_noseg": dict(kernel="tp", pbatch=8,
                               pool_dtype="bfloat16", voxel_res=256,
                               max_samples=256, L=96, exact_cull=96,
                               bands=(), drain_tiles=32,
                               drain_L=128, drain_xc=96),
    "tp8xc96b_v256": dict(kernel="tp", pbatch=8,
                          pool_dtype="bfloat16", voxel_res=256,
                          max_samples=256, L=96, exact_cull=96,
                          bands="auto", drain_tiles=64,
                          drain_L=128, drain_xc=96),
    # (the two-phase sigma-prepass variants were deleted with the code
    # path in r4 — see DESIGN_NOTES R4.4)
    # Bk=4 slab geometry: 8x fewer one-hot matmul FLOPs per pair, ~2x
    # more pairs -> expected net ~4x (see DESIGN_NOTES R3.2 flop budget)
    "tp4_b4": dict(kernel="tp", pbatch=4, block=4, L=128, drain_L=512),
    "tp8_b4": dict(kernel="tp", pbatch=8, block=4, L=128, drain_L=512),
    "t_b4":   dict(kernel="t", block=4, L=128, drain_L=512),
    "tp8_b4_ms256": dict(kernel="tp", pbatch=8, block=4, L=128,
                         drain_L=512, max_samples=256),
    "tp8": dict(kernel="tp", pbatch=8),
    "t": dict(kernel="t"),
    "n": dict(kernel="n"),
    "tp4_ms256": dict(kernel="tp", pbatch=4, max_samples=256),
    "tp4_nodrain": dict(kernel="tp", pbatch=4, drain_tiles=0),
    "tp4_L96": dict(kernel="tp", pbatch=4, L=96),
    "tp4_flat": dict(kernel="tp", pbatch=4, bands=()),
    # round 5: WORKLIST grid — only real (tile, P-group) work items are
    # sequenced (the dense grid pays ~2.7 us/step for ~60k steps of
    # which most are dead padding; tools/profile_frame.py trace).
    "wl16xc96_v256": dict(kernel="wl", pbatch=16, pool_dtype="bfloat16",
                          voxel_res=256, max_samples=256, L=96,
                          exact_cull=96, segment_slots=32,
                          drain_tiles=32, drain_L=128, drain_xc=96),
    "wl8xc96_v256": dict(kernel="wl", pbatch=8, pool_dtype="bfloat16",
                         voxel_res=256, max_samples=256, L=96,
                         exact_cull=96, segment_slots=32,
                         drain_tiles=32, drain_L=128, drain_xc=96),
    "wl16seg96_v256": dict(kernel="wl", pbatch=16, pool_dtype="bfloat16",
                           voxel_res=256, max_samples=256, L=96,
                           exact_cull=96, segment_slots=96,
                           drain_tiles=32, drain_L=128, drain_xc=96),
    "wl16xc96_v256_T3": dict(kernel="wl", pbatch=16,
                             pool_dtype="bfloat16", voxel_res=256,
                             max_samples=256, L=96, exact_cull=96,
                             segment_slots=32, drain_tiles=32,
                             drain_L=128, drain_xc=96,
                             T_threshold=1e-3),
    "wl16xc96_v512": dict(kernel="wl", pbatch=16, pool_dtype="bfloat16",
                          voxel_res=512, max_samples=256, L=192,
                          exact_cull=96, segment_slots=32,
                          drain_tiles=64, drain_L=256, drain_xc=256),
    # global-worklist variants (one frame-wide worklist; wl_cap = groups
    # per segment across ALL tiles)
    "wl16g_c2k": dict(kernel="wl", pbatch=16, pool_dtype="bfloat16",
                      voxel_res=256, max_samples=256, L=96,
                      exact_cull=96, segment_slots=32, wl_cap=2048,
                      drain_tiles=256, drain_L=128, drain_xc=96),
    "wl16g_c3k": dict(kernel="wl", pbatch=16, pool_dtype="bfloat16",
                      voxel_res=256, max_samples=256, L=96,
                      exact_cull=96, segment_slots=32, wl_cap=3072,
                      drain_tiles=128, drain_L=128, drain_xc=96),
    "wl16g_c5k": dict(kernel="wl", pbatch=16, pool_dtype="bfloat16",
                      voxel_res=256, max_samples=256, L=96,
                      exact_cull=96, segment_slots=32, wl_cap=5120,
                      drain_tiles=64, drain_L=128, drain_xc=96),
    "wl16g_c3k_T3": dict(kernel="wl", pbatch=16, pool_dtype="bfloat16",
                         voxel_res=256, max_samples=256, L=96,
                         exact_cull=96, segment_slots=32, wl_cap=3072,
                         drain_tiles=128, drain_L=128, drain_xc=96,
                         T_threshold=1e-3),
    "wl8g_c4k": dict(kernel="wl", pbatch=8, pool_dtype="bfloat16",
                     voxel_res=256, max_samples=256, L=96,
                     exact_cull=96, segment_slots=32, wl_cap=4096,
                     drain_tiles=128, drain_L=128, drain_xc=96),
    # c5k champion follow-ups (4.26 FPS exact; c<=3k starves whole
    # trailing tiles — the cap must cover the true per-segment load)
    "wl16g_c5k_T3": dict(kernel="wl", pbatch=16, pool_dtype="bfloat16",
                         voxel_res=256, max_samples=256, L=96,
                         exact_cull=96, segment_slots=32, wl_cap=5120,
                         drain_tiles=64, drain_L=128, drain_xc=96,
                         T_threshold=1e-3),
    "wl16g_c4k": dict(kernel="wl", pbatch=16, pool_dtype="bfloat16",
                      voxel_res=256, max_samples=256, L=96,
                      exact_cull=96, segment_slots=32, wl_cap=4096,
                      drain_tiles=128, drain_L=128, drain_xc=96),
    "wl16g_c5k_seg48": dict(kernel="wl", pbatch=16,
                            pool_dtype="bfloat16", voxel_res=256,
                            max_samples=256, L=96, exact_cull=96,
                            segment_slots=48, wl_cap=5120,
                            drain_tiles=64, drain_L=128, drain_xc=96),
    "wl16g_c5k_ms512": dict(kernel="wl", pbatch=16,
                            pool_dtype="bfloat16", voxel_res=256,
                            max_samples=512, L=96, exact_cull=96,
                            segment_slots=32, wl_cap=5120,
                            drain_tiles=64, drain_L=128, drain_xc=96),
    "wl16g_v512_c12k": dict(kernel="wl", pbatch=16,
                            pool_dtype="bfloat16", voxel_res=512,
                            max_samples=256, L=192, exact_cull=96,
                            segment_slots=32, wl_cap=12288,
                            drain_tiles=64, drain_L=256, drain_xc=256),
    # round 5b: P sweep under the GLOBAL worklist.  Mean true hits/tile
    # is ~5 against P-sized groups, so P=16 pays ~3x dead-lane matmul/
    # DMA work per live group; P=8/P=4 shrink the per-step body at the
    # cost of more (cheap) steps.  Caps sized to the true per-segment
    # group load at each P (starvation is catastrophic — R5.4 lesson 3).
    "wl8g_c7k": dict(kernel="wl", pbatch=8, pool_dtype="bfloat16",
                     voxel_res=256, max_samples=256, L=96,
                     exact_cull=96, segment_slots=32, wl_cap=7168,
                     drain_tiles=64, drain_L=128, drain_xc=96),
    "wl8g_c9k": dict(kernel="wl", pbatch=8, pool_dtype="bfloat16",
                     voxel_res=256, max_samples=256, L=96,
                     exact_cull=96, segment_slots=32, wl_cap=9216,
                     drain_tiles=64, drain_L=128, drain_xc=96),
    "wl4g_c12k": dict(kernel="wl", pbatch=4, pool_dtype="bfloat16",
                      voxel_res=256, max_samples=256, L=96,
                      exact_cull=96, segment_slots=32, wl_cap=12288,
                      drain_tiles=64, drain_L=128, drain_xc=96),
    "wl8g_c7k_T3": dict(kernel="wl", pbatch=8, pool_dtype="bfloat16",
                        voxel_res=256, max_samples=256, L=96,
                        exact_cull=96, segment_slots=32, wl_cap=7168,
                        drain_tiles=64, drain_L=128, drain_xc=96,
                        T_threshold=1e-3),
}


def main():
    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.eval.metrics import psnr as psnr_fn
    from google_nerf_tpu.models.baked import BakedConfig, bake
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.models.render_brick import brick_geometry
    from google_nerf_tpu.models.render_brick_mxu import render_brick_mxu
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    # EXACT bench.py / r3_train_ab "base" config -> warm compile cache
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=256,
                      num_epochs=30, samples_budget=131072,
                      random_bg=True, exclude_incomplete="backfill",
                      march="block")
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style="textured")
    cache = "/tmp/bench_state_textured.npz"
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    if os.path.exists(cache):
        z = np.load(cache)
        flat, tree = jax.tree_util.tree_flatten(state["params"])
        state["params"] = jax.tree_util.tree_unflatten(
            tree, [jnp.asarray(z[f"p{i}"]).astype(l.dtype)
                   for i, l in enumerate(flat)])
        state["occ"] = jnp.asarray(z["occ"])
        print(f"loaded cached state occ="
              f"{float(jnp.mean(state['occ'].astype(jnp.float32))):.3f}")
    else:
        scene = ds.scene()
        t0 = time.time()
        n_train = int(os.environ.get("FPS2_STEPS", 3072))
        metrics = None
        for i in range(n_train):
            if i % 16 == 0:
                state = grid_update_step(
                    state, jax.random.fold_in(key, 2 * i + 1), cfg=cfg,
                    warmup=i < cfg.warmup_steps)
            state, metrics = fused_train_step(
                state, scene, jax.random.fold_in(key, 2 * i), cfg=cfg)
        _ = float(jax.tree_util.tree_leaves(state)[0].ravel()[0])
        print(f"trained {n_train} steps in {time.time()-t0:.0f}s "
              f"psnr={float(metrics['psnr']):.1f} "
              f"occ={float(jnp.mean(state['occ'].astype(jnp.float32))):.3f}")
        flat, _ = jax.tree_util.tree_flatten(state["params"])
        np.savez(cache, occ=np.asarray(state["occ"]),
                 **{f"p{i}": np.asarray(l, dtype=np.float32)
                    for i, l in enumerate(flat)})

    baked_by_blk, geo_by_blk, bcfg_by_blk = {}, {}, {}

    def get_baked(blk, dtype="float8_e4m3fn", vres=512):
        kk = (blk, dtype, vres)
        if kk not in baked_by_blk:
            bc = BakedConfig(voxel_res=vres, block=blk, dtype=dtype)
            t0 = time.time()
            bk = bake(state["params"], cfg.model, state["occ"], bc)
            print(f"bake(block={blk},{dtype}): {time.time()-t0:.0f}s, "
                  f"{bk['n_blocks']} blocks")
            baked_by_blk[kk] = bk
            bcfg_by_blk[kk] = bc
            geo_by_blk[kk] = brick_geometry(bk["block_map"], bc,
                                            cfg.model)
        return baked_by_blk[kk], bcfg_by_blk[kk], geo_by_blk[kk]

    ds_t = SyntheticDataset(split="test", n_images=1, img_wh=(800, 800),
                            style="textured")
    o, d = get_rays(jnp.asarray(ds_t.directions), jnp.asarray(ds_t.poses[0]))
    gt = jnp.asarray(ds_t.rays[0])

    for name in sys.argv[1:] or ["tp4", "t"]:
        v = dict(L=64, max_samples=512, chunk_tiles=512, bands="auto",
                 drain_tiles=256)
        v.update(VARIANTS[name])
        if v.pop("segment_slots", 0):
            v["segment_slots"] = VARIANTS[name]["segment_slots"]
            v["bands"] = ()
        baked, bcfg, geo = get_baked(v.pop("block", 8),
                                     v.pop("pool_dtype", "float8_e4m3fn"),
                                     v.pop("voxel_res", 512))
        tthr = v.pop("T_threshold", 1e-2)

        if v.get("kernel") == "rgba":
            from google_nerf_tpu.models.baked_rgba import \
                render_brick_mxu_rgba
            vr = {k: x for k, x in v.items() if k != "kernel"}

            def frame():
                return render_brick_mxu_rgba(
                    baked, cfg.model, o, d, 800, 800, bcfg=bcfg,
                    T_threshold=tthr, geometry=geo, **vr)
        else:
            def frame():
                return render_brick_mxu(baked, cfg.model, o, d, 800, 800,
                                        bcfg=bcfg, T_threshold=tthr,
                                        geometry=geo, **v)
        try:
            t0 = time.time()
            out = frame()
            _ = float(out["rgb"].ravel()[0])
            t_compile = time.time() - t0
            t0 = time.time()
            outs = [frame()["rgb"] for _ in range(3)]
            _ = float(outs[-1].ravel()[0])
            dt = (time.time() - t0) / 3
            p_gt = float(psnr_fn(out["rgb"], gt))
            print(f"{name} {v}: {dt*1e3:.0f} ms = {1/dt:.2f} FPS "
                  f"(first {t_compile:.0f}s) | psnr vs gt {p_gt:.2f} | "
                  f"trunc_tiles={int(out['trunc_tiles'])} "
                  f"pairs={int(out['pairs_rendered'])} "
                  f"undrained={int(out.get('pairs_undrained', 0))} "
                  f"dma_slots={int(out.get('dma_slots', -1))}")
        except Exception as e:  # noqa: BLE001 — sweep survives a variant
            print(f"{name}: FAILED {type(e).__name__}: {e}"[:400])
    print("DONE")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
