#!/bin/bash
# reference parity wrapper (ngp_pl/benchmarking/benchmark_blendedmvs.sh)
ROOT_DIR=${ROOT_DIR:-/data/blendedmvs}
python benchmarking/run_suite.py --suite blendedmvs --root_dir "$ROOT_DIR" "$@"
