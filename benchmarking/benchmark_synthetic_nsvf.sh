#!/bin/bash
# reference parity wrapper (ngp_pl/benchmarking/benchmark_synthetic_nsvf.sh)
ROOT_DIR=${ROOT_DIR:-/data/synthetic_nsvf}
python benchmarking/run_suite.py --suite synthetic_nsvf --root_dir "$ROOT_DIR" "$@"
