"""FPS of the one-shot renderer (live + baked) at 800^2.

Variants are (name, apply_fn, render kwargs) tuples; pass --k/--passes/
--budget_div/--straggler_div/--ms to add a custom variant, --bake for the
baked-field comparison."""
import argparse
import functools
import time

import jax
import jax.numpy as jnp

print = functools.partial(print, flush=True)


def main():
    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.eval.metrics import psnr as psnr_fn
    from google_nerf_tpu.models.baked import (BakedConfig, bake,
                                              make_baked_apply)
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.models.render_test_oneshot import render_test_oneshot
    from google_nerf_tpu.ops.grid import (pack_occupancy_blocks,
                                          pack_occupancy_u8)
    from google_nerf_tpu.ops.march_seg import required_dilation_radius
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    # num_epochs=30 matches bench.py's TrainConfig exactly -> the fused
    # train program hits the remote compile cache (fresh compiles can cost
    # tens of minutes on this tunnel)
    cfg = TrainConfig(model=model, batch_size=8192, num_epochs=30,
                      samples_budget=131072, random_bg=True)
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style="shell")
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    for i in range(3000):
        if i % 16 == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 2*i+1),
                                     cfg=cfg, warmup=i < cfg.warmup_steps)
        state, metrics = fused_train_step(state, scene,
                                          jax.random.fold_in(key, 2*i),
                                          cfg=cfg)
    jax.block_until_ready(state)
    print(f"trained: psnr={float(metrics['psnr']):.1f} "
          f"occ={float(state['occ'].mean()):.3f}")

    baked_fn = baked = None
    if "--bake" in __import__("sys").argv:
        bcfg = BakedConfig(voxel_res=512, block=8)
        t0 = time.time()
        baked = bake(state["params"], cfg.model, state["occ"], bcfg)
        print(f"bake {time.time()-t0:.0f}s {baked['n_blocks']} blocks")
        baked_fn = make_baked_apply(bcfg)

    ds_t = SyntheticDataset(split="test", n_images=1, img_wh=(800, 800),
                            style="shell")
    o, d = get_rays(jnp.asarray(ds_t.directions),
                    jnp.asarray(ds_t.poses[0]))
    gt = jnp.asarray(ds_t.rays[0])

    occ_cache = {}

    def get_occ(ms, march="seg"):
        key_ = (ms, march)
        if key_ not in occ_cache:
            if march == "block2":
                from google_nerf_tpu.ops.march_block import \
                    pack_occupancy_block2
                occ_cache[key_] = pack_occupancy_block2(
                    state["occ"], max_samples=ms, scale=0.5)
            elif march == "block":
                occ_cache[key_] = pack_occupancy_blocks(state["occ"])
            else:
                occ_cache[key_] = pack_occupancy_u8(
                    state["occ"],
                    required_dilation_radius(8, 128, ms, 0.5),
                    super_radius=required_dilation_radius(32, 128, ms, 0.5))
        return occ_cache[key_]

    import sys
    ap = argparse.ArgumentParser()
    ap.add_argument("--bake", action="store_true")
    ap.add_argument("--variants", default="",
                    help="comma list of k<k>:p<passes>:bd<budget_div>:"
                         "sd<straggler_div>:ms<max_samples>:mb<marcher "
                         "0=seg 1=block 2=block2>:dr<drain 0/1>:"
                         "cm<compact_main 0/1>:ks<n_keep_super>:"
                         "dbd<drain_budget_div> specs; each runs live "
                         "(and baked with --bake)")
    av = ap.parse_args(sys.argv[1:])
    if av.variants:
        variants = []
        for spec in av.variants.split(","):
            f = dict(k=64, p=4, bd=4, sd=4, ms=512, mb=0, dr=0, cm=0, ks=0,
                     dbd=0)
            for part in spec.split(":"):
                kname = part.rstrip("0123456789")
                f[kname] = int(part[len(kname):])
            kw = dict(max_samples=f["ms"], chunk=131072, k=f["k"],
                      passes=f["p"], budget_div=f["bd"],
                      straggler_div=f["sd"], drain=bool(f["dr"]),
                      compact_main=bool(f["cm"]), n_keep_super=f["ks"],
                      drain_budget_div=f["dbd"],
                      march={0: "seg", 1: "block", 2: "block2"}[f["mb"]])
            variants.append((f"live {spec}", None, kw))
            if baked_fn is not None:
                variants.append((f"baked {spec}", baked_fn, kw))
    else:
        variants = [
            ("live ms512", None, dict(max_samples=512, chunk=131072)),
            ("live ms256", None, dict(max_samples=256, chunk=131072)),
        ]
        if baked_fn is not None:
            variants += [("baked ms512", baked_fn,
                          dict(max_samples=512, chunk=131072))]
    for name, fn, v in variants:
        p = baked if fn is not None else state["params"]

        def frame(full=False):
            r = render_test_oneshot(p, cfg.model, get_occ(
                v["max_samples"], v.get("march", "seg")), o, d,
                T_threshold=1e-2, apply_fn=fn, **v)
            return r if full else r["rgb"]
        full0 = frame(True)
        out = full0["rgb"]
        jax.block_until_ready(out)
        if "drain_trips" in full0:
            print(f"  drain_trips={int(full0['drain_trips'])} "
                  f"alive_after_main={int(full0['alive_after_main'])}")
        t0 = time.time()
        outs = [frame() for _ in range(3)]
        # scalar fetch, not block_until_ready: dispatches execute in order
        # on the device stream, so fetching an element of the LAST frame
        # bounds them all (DESIGN_NOTES timing-audit law)
        _ = float(outs[-1][0, 0])
        dt = (time.time() - t0) / 3
        print(f"{name} {v}: {dt*1e3:.0f} ms = {1/dt:.2f} FPS | "
              f"psnr {float(psnr_fn(out, gt)):.2f}")


if __name__ == "__main__":
    main()
