"""Random subset of a depth-annotation JSON.

TPU-native rebuild of `AdelaiDepth/LeReS/Train/get_data_subset.py`: sample
NUM_SUBSET annotations from `<root>/<name>/annotations/<split>_annotations
.json` into `<split>_annotations_subset.json` (the file the multi-dataset
loader prefers).
"""
from __future__ import annotations

import argparse
import json
import os
import random


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default="datasets")
    p.add_argument("--dataset", required=True)
    p.add_argument("--split", default="train")
    p.add_argument("--num_subset", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    adir = os.path.join(args.dataroot, args.dataset, "annotations")
    src = os.path.join(adir, f"{args.split}_annotations.json")
    with open(src) as f:
        annos = json.load(f)
    random.Random(args.seed).shuffle(annos)
    subset = annos[:args.num_subset]
    dst = os.path.join(adir, f"{args.split}_annotations_subset.json")
    with open(dst, "w") as f:
        json.dump(subset, f)
    print(f"{len(subset)}/{len(annos)} annotations -> {dst}")


if __name__ == "__main__":
    main()
