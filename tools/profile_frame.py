"""Trace ONE MXU-brick frame with jax.profiler and print the top ops by
device self-time, parsed straight from the perfetto trace (no
tensorboard needed).  Settles where the ~260 ms front-end floor lives
(fps_mxu2 L8 probe; every cull knob failed to move it).

Run on chip: python tools/profile_frame.py [variant-kwargs via env]
"""
import functools
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

print = functools.partial(print, flush=True)


def main():
    from google_nerf_tpu.core.rays import get_rays
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.baked import BakedConfig, bake
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.models.render_brick import brick_geometry
    from google_nerf_tpu.models.render_brick_mxu import render_brick_mxu
    from google_nerf_tpu.train.system import TrainConfig, init_train_state

    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=8192, k_samples=256,
                      num_epochs=30, samples_budget=131072,
                      random_bg=True, exclude_incomplete="backfill",
                      march="block")
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style="textured")
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    z = np.load("/tmp/bench_state_textured.npz")
    flat, tree = jax.tree_util.tree_flatten(state["params"])
    params = jax.tree_util.tree_unflatten(
        tree, [jnp.asarray(z[f"p{i}"]).astype(l.dtype)
               for i, l in enumerate(flat)])
    occ = jnp.asarray(z["occ"])
    bcfg = BakedConfig(voxel_res=int(os.environ.get("PF_VRES", 512)),
                       block=8, dtype="bfloat16")
    baked = bake(params, model, occ, bcfg)
    geo = brick_geometry(baked["block_map"], bcfg, model)

    ds_t = SyntheticDataset(split="test", n_images=1, img_wh=(800, 800),
                            style="textured")
    o, d = get_rays(jnp.asarray(ds_t.directions),
                    jnp.asarray(ds_t.poses[0]))

    v = dict(L=int(os.environ.get("PF_L", 192)),
             exact_cull=int(os.environ.get("PF_XC", 48)),
             max_samples=256, chunk_tiles=512,
             drain_tiles=int(os.environ.get("PF_D", 256)),
             drain_L=int(os.environ.get("PF_DL", 256)),
             drain_xc=int(os.environ.get("PF_DXC", 96)),
             kernel=os.environ.get("PF_KERNEL", "tp"),
             pbatch=int(os.environ.get("PF_P", 8)),
             wl_cap=int(os.environ.get("PF_CAP", 0)))
    seg = int(os.environ.get("PF_SEG", 8))
    if seg:
        v["segment_slots"], v["bands"] = seg, ()
    else:
        v["bands"] = "auto"
    if os.environ.get("PF_SIMPLE"):
        v = dict(L=8, max_samples=256, chunk_tiles=512, bands=(),
                 drain_tiles=0, kernel="tp", pbatch=8)

    def frame():
        return render_brick_mxu(baked, model, o, d, 800, 800, bcfg=bcfg,
                                T_threshold=1e-2, geometry=geo, **v)

    out = frame()
    _ = float(out["rgb"].ravel()[0])        # compile + warm
    tdir = "/tmp/jax_frame_trace"
    os.system(f"rm -rf {tdir}")
    t0 = time.time()
    with jax.profiler.trace(tdir):
        out = frame()
        _ = float(out["rgb"].ravel()[0])
    print(f"traced frame: {time.time()-t0:.3f}s wall")

    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    print(f"trace files: {paths}")
    agg = {}
    total = 0.0
    for p in paths:
        with gzip.open(p, "rt") as f:
            tr = json.load(f)
        # device-lane filter (profile_train.py method): only pids whose
        # process name mentions TPU/TensorCore/device
        pidname = {}
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pidname[ev.get("pid")] = ev["args"].get("name", "")
        dev_pids = {pid for pid, n in pidname.items()
                    if "TPU" in n or "Tensor" in n or "/device" in n.lower()}
        for ev in tr.get("traceEvents", []):
            if ev.get("ph") != "X":
                continue
            if dev_pids and ev.get("pid") not in dev_pids:
                continue
            name = ev.get("name", "?")
            dur = ev.get("dur", 0) / 1e3          # ms
            agg[name] = agg.get(name, 0.0) + dur
            total += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
    print(f"sum of spans: {total:.1f} ms (overcounts nesting)")
    for name, ms in top:
        print(f"{ms:9.2f} ms  {name[:110]}")
    print("DONE")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
