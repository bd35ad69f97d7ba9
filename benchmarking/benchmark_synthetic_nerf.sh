#!/bin/bash
# reference parity wrapper (ngp_pl/benchmarking/benchmark_synthetic_nerf.sh)
ROOT_DIR=${ROOT_DIR:-/data/synthetic_nerf}
python benchmarking/run_suite.py --suite synthetic_nerf --root_dir "$ROOT_DIR" "$@"
