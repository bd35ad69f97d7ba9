#!/bin/bash
# reference parity wrapper (ngp_pl/benchmarking/benchmark_tat.sh)
ROOT_DIR=${ROOT_DIR:-/data/tat}
python benchmarking/run_suite.py --suite tat --root_dir "$ROOT_DIR" "$@"
