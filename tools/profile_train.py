"""Trace fused_train_step on chip and print the top device ops by
aggregated duration, parsed from the perfetto JSON (the profile_frame.py
method).  Identifies the non-encoder ~25 ms of the 44-52 ms step that
config-space cannot remove (r4 A/B).

Run: python tools/profile_train.py [base|ms512_k256_bud10]
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

print = functools.partial(print, flush=True)


def main():
    from google_nerf_tpu.data.synthetic import SyntheticDataset
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                              grid_update_step,
                                              init_train_state)
    name = sys.argv[1] if len(sys.argv) > 1 else "ms512_k256_bud10"
    conf = {"base": dict(ms=1024, budget=16 * 8192),
            "ms512_k256_bud10": dict(ms=512, budget=10 * 8192),
            # superlinear-batch forensics (VERDICT r3 weak 2): same
            # per-ray recipe at 2x/4x rays — diff the per-op table
            # against the 8k run to find the superlinear ops
            "b16k": dict(ms=512, budget=10 * 16384, batch=16384),
            "b32k": dict(ms=512, budget=10 * 32768, batch=32768),
            # r5 flagship candidates (bud7 + gdiv16 + block2 marcher)
            "blk2": dict(ms=512, budget=7 * 8192, march="block2"),
            "blk2_t15": dict(ms=512, budget=7 * 8192, march="block2",
                             tsize=15)}[name]
    model = NGPConfig(scale=0.5, encoder="packed", grid_size=128,
                      packed_log2_size=conf.get("tsize", 16),
                      compute_dtype=jnp.bfloat16)
    cfg = TrainConfig(model=model, batch_size=conf.get("batch", 8192),
                      k_samples=256,
                      max_samples=conf["ms"], num_epochs=30,
                      samples_budget=conf["budget"], random_bg=True,
                      exclude_incomplete="backfill",
                      march=conf.get("march", "block"),
                      grid_sample_div=16)
    ds = SyntheticDataset(split="train", n_images=40, img_wh=(256, 256),
                          style="textured")
    scene = ds.scene()
    key = jax.random.PRNGKey(0)
    state = init_train_state(key, cfg, ds.K, ds.poses, ds.img_wh)
    for i in range(512):
        if i % 16 == 0:
            state = grid_update_step(state, jax.random.fold_in(key, 991 + i),
                                     cfg=cfg, warmup=i < 256)
        state, m = fused_train_step(state, scene,
                                    jax.random.fold_in(key, i), cfg=cfg)
    _ = float(m["psnr"])
    print(f"warmed {name}: s_per_ray={float(m['s_per_ray']):.1f}")

    tdir = "/tmp/jax_train_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for i in range(5):
            state, m = fused_train_step(
                state, scene, jax.random.fold_in(key, 600 + i), cfg=cfg)
        _ = float(m["psnr"])
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    agg = {}
    for p in paths:
        with gzip.open(p, "rt") as f:
            tr = json.load(f)
        # keep only TensorCore-lane events: find pids whose process name
        # mentions TPU / TensorCore
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
            agg[ev.get("name", "?")] = (agg.get(ev.get("name", "?"), 0.0)
                                        + ev.get("dur", 0) / 1e3)
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:35]
    tot = sum(agg.values())
    print(f"device-span sum {tot:.1f} ms over 5 steps "
          f"({tot/5:.1f} ms/step if single-lane)")
    for n, v in top:
        print(f"{v/5:8.2f} ms/step  {n[:100]}")
    print("DONE")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
