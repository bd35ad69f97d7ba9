"""Benchmark-suite driver (reference `ngp_pl/benchmarking/*.sh`).

One parameterized driver replaces the four shell scripts: it trains every
scene of a suite with the suite's recipe, collects test PSNR/SSIM/LPIPS,
training wall-clock, and render FPS, and writes a JSON summary comparable
against the reference README tables (`ngp_pl/README.md:102-155`).

  python benchmarking/run_suite.py --suite synthetic_nerf \\
      --root_dir /data/Synthetic_NeRF [--scenes Lego Chair] [--out out.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# suite -> (dataset_name, scenes, extra CLI args)   [benchmarking/*.sh]
SUITES = {
    "synthetic_nerf": ("nsvf",
                       ["Chair", "Drums", "Ficus", "Hotdog", "Lego",
                        "Materials", "Mic", "Ship"],
                       ["--num_epochs", "20", "--batch_size", "16384",
                        "--lr", "2e-2"]),
    "synthetic_nsvf": ("nsvf",
                       ["Wineholder", "Steamtrain", "Toad", "Robot",
                        "Bike", "Palace", "Spaceship", "Lifestyle"],
                       ["--num_epochs", "20", "--batch_size", "16384",
                        "--lr", "2e-2"]),
    "tat": ("nsvf",
            ["Ignatius", "Truck", "Barn", "Caterpillar", "Family"],
            ["--num_epochs", "20", "--batch_size", "16384", "--lr", "2e-2",
             "--downsample", "0.5"]),
    "blendedmvs": ("nsvf",
                   ["Jade", "Fountain", "Character", "Statues"],
                   ["--num_epochs", "20", "--batch_size", "16384",
                    "--lr", "2e-2"]),
    # procedural suite: no external data (zero-egress env) — the three
    # analytic field styles stand in as scenes so the WHOLE suite driver
    # (train -> eval -> JSON summary) executes end-to-end; scene name
    # maps to --synthetic_style below
    "procedural": ("synthetic",
                   ["solid", "shell", "textured"],
                   ["--num_epochs", "3", "--batch_size", "8192",
                    "--downsample", "4.0"]),
}

# reference per-scene/average PSNR for parity checks (ngp_pl/README.md)
REFERENCE_PSNR = {
    "synthetic_nerf": {"Mic": 35.59, "Ficus": 34.13, "Chair": 35.28,
                       "Hotdog": 37.35, "Materials": 29.46, "Drums": 25.81,
                       "Ship": 30.32, "Lego": 35.76, "avg": 32.96},
    "synthetic_nsvf": {"avg": 35.80},
    "tat": {"avg": 28.78},
    "blendedmvs": {"avg": 27.38},
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", required=True, choices=sorted(SUITES))
    p.add_argument("--root_dir", required=True,
                   help="suite root containing one directory per scene")
    p.add_argument("--scenes", nargs="*", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--parity_md", default=None,
                   help="append a per-round markdown results table to "
                        "this file (e.g. PARITY.md) — one table per "
                        "invocation, tagged with --round_tag")
    p.add_argument("--round_tag", default="")
    p.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                   help="everything after --extra is passed verbatim to "
                        "train.py (REMAINDER: dashed flags allowed)")
    args = p.parse_args()

    from opt import get_opts
    from train import main as train_main

    dataset_name, scenes, recipe = SUITES[args.suite]
    scenes = args.scenes or scenes
    results = {}
    for scene in scenes:
        scene_dir = os.path.join(args.root_dir, scene)
        if dataset_name == "synthetic":
            # procedural scene: "scene" is the analytic-field style
            scene_dir = args.root_dir
            recipe_sc = recipe + ["--synthetic_style", scene]
        elif not os.path.isdir(scene_dir):
            print(f"[skip] {scene}: {scene_dir} not found")
            continue
        else:
            recipe_sc = recipe
        argv = ["--root_dir", scene_dir, "--dataset_name", dataset_name,
                "--exp_name", f"{args.suite}_{scene}", "--no_save_test",
                "--bf16", "--xyz_encoder", "packed"] + recipe_sc + args.extra
        print(f"=== {scene}: train.py {' '.join(argv)}")
        t0 = time.time()
        hparams = get_opts(argv)
        logs = train_main(hparams)
        logs["train_time_s"] = round(time.time() - t0, 1)
        ref = REFERENCE_PSNR.get(args.suite, {}).get(scene)
        if ref:
            logs["reference_psnr"] = ref
        results[scene] = logs
        print(f"=== {scene}: {logs}")

    if results:
        import numpy as np
        avg = {k: float(np.mean([r[k] for r in results.values()
                                 if k in r]))
               for k in ("psnr", "ssim", "lpips", "train_time_s",
                         "train_time_net_s")
               if any(k in r for r in results.values())}
        results["average"] = avg
        results["reference_average_psnr"] = REFERENCE_PSNR.get(
            args.suite, {}).get("avg")
    out_path = args.out or f"benchmark_{args.suite}.json"
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))

    if args.parity_md and results:
        # per-round regression table (VERDICT r3 item 7): one suite run
        # per round, appended to PARITY.md so quality/serving trends live
        # in a single artifact
        # train_time_net_s excludes compile-service wait (train.py
        # extrapolates the post-warmup rate) — the regression-comparable
        # column; train_time_s keeps the raw wall for honesty
        cols = ("psnr", "ssim", "lpips", "train_time_s",
                "train_time_net_s")
        with open(args.parity_md, "a") as f:
            f.write(f"\n## Suite `{args.suite}`"
                    + (f" — {args.round_tag}" if args.round_tag else "")
                    + "\n\n")
            f.write("| scene | " + " | ".join(cols) + " |\n")
            f.write("|---|" + "---|" * len(cols) + "\n")
            for sc, r in results.items():
                if not isinstance(r, dict):
                    continue
                f.write(f"| {sc} | " + " | ".join(
                    (f"{r[c]:.3f}" if isinstance(r.get(c), float)
                     else str(r.get(c, "—"))) for c in cols) + " |\n")
        print(f"parity table appended to {args.parity_md}")


if __name__ == "__main__":
    main()
