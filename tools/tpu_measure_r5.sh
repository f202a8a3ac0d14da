#!/bin/bash
# Round-5 stage-B measurement batch (run AFTER tools/make_bench_cache.sh
# has built the headline artifact).  Serializes the TPU relay work:
#
#   1. full bench.py with generous budgets — warm Pallas headline into
#      BENCH_EXTRAS.json + cold-compiles the Pallas extras chains
#      (sim / likelihood / 3-layer exposure / production-8, now with
#      the fused r_cal_diff 'R' stage) into the same cache dir;
#   2. profile_staged stage+rsub attribution (mostly warm after 1);
#   3. profile_mesh XLA leg (honest multi-SCA-per-chip number);
#   4. profile_stages ablate — frame-IPC in-core validation.
#
# Every step appends to $LOG; the cache dir accumulates all compiled
# executables for the refreshed bench_cache artifact.
set -x
cd "$(dirname "$0")/.."

DIR=${1:-/tmp/bench_cache_r5}
LOG=${LOG:-/tmp/tpu_r5_batch.log}
export ROMAN_XLA_CACHE_DIR="$DIR"

{
  echo "=== r5 stage B batch start $(date -u)"

  echo "--- 1. full bench (warm headline + pallas extras)"
  ROMAN_BENCH_PALLAS_BUDGET_S=1800 ROMAN_BENCH_BUDGET_S=14400 \
    python bench.py

  echo "--- 2. profile_staged stages+rsub"
  timeout 7200 python tools/profile_staged.py 4096 all

  echo "--- 3. profile_mesh (XLA first)"
  ROMAN_MESH_PALLAS=0 timeout 7200 python tools/profile_mesh.py 4096 2

  echo "--- 4. profile_stages ablate (frame-IPC in-core A/B)"
  timeout 14400 python tools/profile_stages.py ablate 4096

  echo "=== r5 stage B batch done $(date -u)"
} >> "$LOG" 2>&1
