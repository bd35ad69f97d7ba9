"""Test CLI — parity with reference `ngp_pl/test.py:14-45`: load a (slim)
checkpoint, render the test split, report mean PSNR and FPS.

FPS timing follows the repo's timing law (DESIGN_NOTES.md round 8):
`jax.block_until_ready` can return early through this environment's async
relay, so every timed frame ends with a HOST SCALAR FETCH, which cannot.
T_threshold=1e-2 matches the reference benchmark (`test.py:33`).
"""
from __future__ import annotations

import os
import time

import numpy as np

from opt import get_opts
from train import build_configs, dataset_kwargs


def run(hparams):
    from train import apply_platform
    apply_platform(hparams)

    import jax
    import jax.numpy as jnp

    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data import dataset_dict
    from google_nerf_tpu.eval.metrics import psnr
    from google_nerf_tpu.models.render_test_fast import render_test_fast
    from google_nerf_tpu.models.rendering import render_test
    from google_nerf_tpu.ops.grid import pack_occupancy_u8
    from google_nerf_tpu.ops.march_seg import required_dilation_radius
    from google_nerf_tpu.train.system import init_train_state
    from google_nerf_tpu.utils.ckpt import load_ckpt_filtered

    kwargs = dataset_kwargs(hparams)
    dataset = dataset_dict[hparams.dataset_name](
        hparams.root_dir, split='test', downsample=hparams.downsample,
        **kwargs)
    cfg = build_configs(hparams)

    full = init_train_state(jax.random.PRNGKey(0), cfg, dataset.K,
                            dataset.poses, dataset.img_wh)
    # prefix-filtered partial load (reference `ngp_pl/utils.py:20-25`):
    # restores whatever the (slim or full) checkpoint provides and keeps
    # freshly-initialised values for the rest
    state = load_ckpt_filtered(hparams.ckpt_path, full,
                               include_prefixes=("params", "occ", "step",
                                                 "density_grid"))

    w, h = dataset.img_wh
    renderer = getattr(hparams, "renderer", "fast")
    # always repack from the raw occupancy: the packed layout is derived
    # data and checkpoints written before a layout change (e.g. the 3^3
    # block-word upgrade) would otherwise march empty space.  Radii are
    # computed for the COARSEST lattice any renderer here may use (larger
    # dt -> larger radius -> strictly conservative for finer lattices).
    ms_pack = min(cfg.max_samples,
                  getattr(hparams, "render_max_samples", 512)
                  or cfg.max_samples)
    occ_u8 = pack_occupancy_u8(
        jnp.asarray(state["occ"]),
        required_dilation_radius(8, cfg.model.grid_size, ms_pack,
                                 cfg.model.scale),
        super_radius=required_dilation_radius(
            32, cfg.model.grid_size, ms_pack, cfg.model.scale))
    # serving with the one-phase block marcher (single-cascade scenes):
    # exact-occupancy block rows, no dilation
    serve_march = (getattr(hparams, "march", "seg")
                   if getattr(hparams, "march", "seg") in ("block", "block2")
                   and cfg.model.cascades == 1 else "seg")
    if serve_march == "block2":
        from google_nerf_tpu.ops.march_block import pack_occupancy_block2
        occ_oneshot = pack_occupancy_block2(
            jnp.asarray(state["occ"]),
            max_samples=(getattr(hparams, "render_max_samples", 512)
                         or cfg.max_samples),
            scale=cfg.model.scale)
    elif serve_march == "block":
        from google_nerf_tpu.ops.grid import pack_occupancy_blocks
        occ_oneshot = pack_occupancy_blocks(jnp.asarray(state["occ"]))
    else:
        occ_oneshot = occ_u8
    baked = bcfg = None
    if renderer in ("brick", "brick_mxu"):
        if cfg.exp_step_factor != 0.0:
            print("brick renderers target bounded scenes; "
                  "falling back to oneshot")
            renderer = "oneshot"
        else:
            hparams.bake = True
    if getattr(hparams, "load_bake", None):
        from google_nerf_tpu.models.baked import (load_baked,
                                                  render_test_baked)
        baked, bcfg = load_baked(hparams.load_bake)
        print(f'loaded bake: {baked["n_blocks"]} blocks '
              f'(pool {baked["pool"].nbytes / 2**20:.0f} MiB, '
              f'{bcfg.dtype})')
    elif getattr(hparams, "bake", False):
        from google_nerf_tpu.models.baked import (BakedConfig, bake,
                                                  render_test_baked)
        bcfg = BakedConfig(voxel_res=hparams.bake_res,
                           dtype=getattr(hparams, "bake_dtype", "bfloat16"))
        t0 = time.time()
        baked = bake(state["params"], cfg.model, jnp.asarray(state["occ"]),
                     bcfg)
        print(f'baked {baked["n_blocks"]} blocks in {time.time()-t0:.1f}s '
              f'(pool {baked["pool"].nbytes / 2**20:.0f} MiB)')
        if getattr(hparams, "save_bake", None):
            from google_nerf_tpu.models.baked import save_baked
            save_baked(hparams.save_bake, baked, bcfg)
            print(f'saved bake -> {hparams.save_bake}')

    brick_geo = None
    if renderer == "brick_mxu":
        from google_nerf_tpu.models.render_brick import brick_geometry
        brick_geo = brick_geometry(baked["block_map"], bcfg, cfg.model)
        print(f"brick geometry: {brick_geo[0].shape[0]} bricks")
    if renderer == "brick":
        from google_nerf_tpu.models.render_brick import (brick_geometry,
                                                         render_brick)
        brick_geo = brick_geometry(baked["block_map"], bcfg, cfg.model)
        print(f"brick geometry: {brick_geo[0].shape[0]} bricks")
        if not getattr(hparams, "brick_ppr", 3.0):
            # --brick_ppr 0 = auto: render pose 0 with a generous budget,
            # read the true per-frame window count, size the budget with
            # 1.5x margin for chunk imbalance (costs one extra compile)
            ro0, rd0 = get_rays(jnp.asarray(dataset.directions),
                                jnp.asarray(dataset.poses[0]))
            rms0 = getattr(hparams, "render_max_samples", 512) \
                or cfg.max_samples
            probe = render_brick(
                baked, cfg.model, ro0, rd0, w, h, bcfg=bcfg,
                geometry=brick_geo, pairs_per_ray=16.0,
                L=getattr(hparams, "brick_L", 256),
                Lk=getattr(hparams, "brick_Lk", 24),
                macro_tiles=getattr(hparams, "brick_macro", 8),
                macro_L=getattr(hparams, "brick_macro_L", 1024),
                max_samples=rms0)
            # size the shared per-chunk budget off the DENSEST chunk, not
            # the frame mean: content concentrates in central chunks and a
            # mean-based budget starves them (BENCH_r01: 560,930 dropped
            # pairs at the old 1.5x-mean auto sizing)
            tpx = 8 * 8
            n_tiles = ((w + 7) // 8) * ((h + 7) // 8)
            chunk_rays = min(2048, n_tiles) * tpx
            hparams.brick_ppr = max(0.5, round(1.25 * float(
                jnp.max(probe["pairs_per_chunk"])) / chunk_rays, 1))
            print(f'brick auto budget: {int(probe["pairs_total"])} windows '
                  f'(densest chunk {int(jnp.max(probe["pairs_per_chunk"]))}'
                  f'/{chunk_rays} rays) -> --brick_ppr {hparams.brick_ppr}')

    directions = jnp.asarray(dataset.directions)
    psnrs, times = [], []
    for i in range(len(dataset.poses)):
        rays_o, rays_d = get_rays(directions,
                                  jnp.asarray(dataset.poses[i]))
        t0 = time.time()
        if renderer == "brick_mxu":
            from google_nerf_tpu.models.render_brick_mxu import \
                render_brick_mxu
            rms = getattr(hparams, "render_max_samples", 512) \
                or cfg.max_samples
            seg = getattr(hparams, "brick_mxu_seg", 8)
            out = render_brick_mxu(
                baked, cfg.model, rays_o, rays_d, w, h, bcfg=bcfg,
                T_threshold=getattr(hparams, "T_threshold", 1e-2),
                geometry=brick_geo,
                L=getattr(hparams, "brick_mxu_L", 192),
                kernel=getattr(hparams, "brick_mxu_kernel", "tp"),
                pbatch=getattr(hparams, "brick_mxu_pbatch", 8),
                exact_cull=getattr(hparams, "brick_mxu_exact_cull", 48),
                wl_cap=getattr(hparams, "brick_mxu_wl_cap", 5120),
                segment_slots=seg,
                drain_xc=getattr(hparams, "brick_mxu_drain_xc", 96),
                bands=("auto" if (getattr(hparams, "brick_mxu_bands", 1)
                                  and not seg) else ()),
                drain_tiles=getattr(hparams, "brick_mxu_drain", 256),
                macro_tiles=getattr(hparams, "brick_macro", 8),
                macro_L=getattr(hparams, "brick_macro_L", 1024),
                max_samples=rms)
            if i == 0:
                # trunc_tiles / pairs_undrained count content still culled
                # AFTER the overflow drain — nonzero means raise
                # --brick_mxu_drain (more drain tiles per chunk)
                print(f'brick_mxu telemetry (frame 0): '
                      f'trunc_tiles={int(out["trunc_tiles"])} '
                      f'pairs={int(out["pairs_rendered"])} '
                      f'undrained={int(out["pairs_undrained"])}')
        elif renderer == "brick":
            rms = getattr(hparams, "render_max_samples", 512) \
                or cfg.max_samples
            br_kw = dict(
                bcfg=bcfg, T_threshold=1e-2, geometry=brick_geo,
                L=getattr(hparams, "brick_L", 256),
                Lk=getattr(hparams, "brick_Lk", 24),
                pairs_per_ray=getattr(hparams, "brick_ppr", 3.0),
                pass_fracs=tuple(getattr(hparams, "brick_passes", None)
                                 or ()),
                drain_frac=getattr(hparams, "brick_drain", 0.25),
                macro_tiles=getattr(hparams, "brick_macro", 8),
                macro_L=getattr(hparams, "brick_macro_L", 1024),
                max_samples=rms)
            n_dev = getattr(hparams, "num_gpus", 1)
            if n_dev == -1:
                n_dev = jax.device_count()
            if n_dev > 1:
                from google_nerf_tpu.parallel.dp import (make_mesh,
                                                         render_brick_dp)
                out = render_brick_dp(baked, cfg.model, rays_o, rays_d,
                                      w, h, make_mesh(n_dev), **br_kw)
            else:
                out = render_brick(baked, cfg.model, rays_o, rays_d,
                                   w, h, **br_kw)
            if i == 0:
                # truncation telemetry: nonzero trunc counts mean content
                # was culled (tile lists / per-ray windows overflowed —
                # raise --brick_L / --brick_Lk); pairs_dropped counts
                # windows beyond the packing budget (raise --brick_ppr;
                # drops are sample-major, so rays lose far tails first).
                # Dense/foggy occupancy inflates all three.
                print(f'brick telemetry (frame 0): '
                      f'trunc_tiles={int(out["trunc_tiles"])} '
                      f'trunc_rays={int(out["trunc_rays"])} '
                      f'pairs_dropped={int(out["pairs_dropped"])}')
        elif renderer == "oneshot" and cfg.exp_step_factor == 0.0:
            from google_nerf_tpu.models.render_test_oneshot import \
                render_test_oneshot
            rms = getattr(hparams, "render_max_samples", 512) \
                or cfg.max_samples
            os_kw = dict(
                T_threshold=1e-2, max_samples=rms, march=serve_march,
                k=getattr(hparams, "oneshot_k", 32),
                budget_div=getattr(hparams, "oneshot_budget_div", 0),
                straggler_div=getattr(hparams, "oneshot_straggler_div", 8),
                drain=getattr(hparams, "oneshot_drain", True),
                passes=getattr(hparams, "oneshot_passes", 6),
                drain_budget_div=getattr(hparams,
                                         "oneshot_drain_budget_div", 0))
            # compact main: phase-A ray culling + drain-only rendering
            # (default ON for block2 serving — background rays cost 8
            # tiny gathers instead of a full march + field eval)
            if (serve_march == "block2" and os_kw["drain"]
                    and getattr(hparams, "oneshot_compact", True)):
                os_kw["compact_main"] = True
            if baked is not None:
                from google_nerf_tpu.models.baked import make_baked_apply
                os_kw["apply_fn"] = make_baked_apply(bcfg)
            p = baked if baked is not None else state["params"]
            n_dev = getattr(hparams, "num_gpus", 1)
            if n_dev == -1:
                n_dev = jax.device_count()
            if n_dev > 1:
                # serve on a mesh: rays sharded, FPS scales linearly
                from google_nerf_tpu.parallel.dp import (
                    make_mesh, render_test_oneshot_dp)
                out = render_test_oneshot_dp(
                    p, cfg.model, occ_oneshot, rays_o, rays_d,
                    make_mesh(n_dev), **os_kw)
            else:
                out = render_test_oneshot(p, cfg.model, occ_oneshot,
                                          rays_o, rays_d, **os_kw)
        elif baked is not None:
            out = render_test_baked(baked, cfg.model, occ_u8, rays_o,
                                    rays_d, bcfg=bcfg, T_threshold=1e-2,
                                    max_samples=cfg.max_samples)
        elif cfg.exp_step_factor == 0.0:
            out = render_test_fast(state["params"], cfg.model, occ_u8,
                                   rays_o, rays_d, T_threshold=1e-2,
                                   max_samples=cfg.max_samples)
        else:
            out = render_test(state["params"], cfg.model, state["occ"],
                              rays_o, rays_d,
                              exp_step_factor=cfg.exp_step_factor,
                              T_threshold=1e-2,
                              max_samples=cfg.max_samples)
        # host scalar fetch closes the timed region (block_until_ready can
        # return early through the axon relay — DESIGN_NOTES.md round 8);
        # it also serialises frames, so no cross-frame overlap inflates FPS
        _ = float(out["rgb"].ravel()[0])
        times.append(time.time() - t0)
        if len(dataset.rays) > 0:
            psnrs.append(float(psnr(out["rgb"],
                                    jnp.asarray(dataset.rays[i]))))
    # first frame includes compilation; report steady-state FPS
    steady = times[1:] if len(times) > 1 else times
    fps = 1.0 / np.mean(steady)
    mean_psnr = float(np.mean(psnrs)) if psnrs else float('nan')
    print(f'mean PSNR: {mean_psnr:.2f}, FPS: {fps:.2f} '
          f'({w}x{h}, {len(times)} frames)')
    return dict(psnr=mean_psnr, fps=fps)


if __name__ == '__main__':
    run(get_opts())
