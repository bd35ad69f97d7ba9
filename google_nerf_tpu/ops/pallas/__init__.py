"""Pallas kernels — status: intentionally empty, by measurement.

Round-2 probes (tools/pallas_probe.py, run on the real v5e target through
this environment's Mosaic toolchain) established that the hot paths this
package was reserved for CANNOT currently be expressed profitably in
Pallas on this target:

  * vectorized dynamic gather from VMEM (`table_ref[idx_vector]`) fails to
    lower: "Cannot do int indexing on TPU" — so a hash-encode gather kernel
    cannot beat XLA's native gather (~130-160M rows/s, row-count bound);
  * scalar-loop scatter-accumulate into a VMEM table crashes the remote
    compile helper (HTTP 500 from tpu_compile_helper), and even if it
    compiled, ~10-30 cycles/row of scalar dynamic-slice RMW is slower than
    the sort-based backward;
  * PrefetchScalarGridSpec per-row DMA gathers require (8, 128)-aligned
    blocks — random single-row lookups cannot be tiled that way.

The TPU-native design therefore moved the win into the ALGORITHM layer
instead of the kernel layer (measured end to end, 12.9k -> 102k rays/s):

  * ops/packed_hash.py — one fat gather per (sample, level) instead of 8
    narrow ones; sort + cumsum + marker-merge backward with zero scatters;
  * ops/march_seg.py — 2-/3-phase dilated-occupancy segment marching, ~4x
    fewer occupancy gathers than dense candidate testing;
  * ops/compaction.py — pure-gather budget packing (no scatter in fwd/bwd).

If a future toolchain adds vector gather/scatter (or SparseCore access),
the first kernels to write here are the hash-encode forward and the
table-gradient scatter; the microbenchmarks to beat live in
tools/sanity_bench.py, tools/microbench3.py and tools/microbench_mlp.py.

Round-5 calibration (tools/microbench_mlp.py on the v5e): the row-count
bound quoted above holds only for NARROW rows — fat rows are BYTE-bound:
1.05M x 64B f32 rows gather in 24.9 ms (42M rows/s) and the same rows in
bf16 (32B) in 14.9 ms (70M rows/s), i.e. cost ~= a + b*row_bytes.  The
packed-corner encode forward (15.6 ms) sits exactly AT its bf16 gather
floor, so the encoder cannot be made faster by any kernel that still
fetches 8 corners x 2 features per (sample, level) — only fewer rows
(sample budget, levels) or narrower rows (dtype) move it.
"""
