#!/bin/bash
# Round-5 recovery watcher + measurement batch (Aug 21).  Armed during
# the 01:30 UTC relay execution outage (compiles/H2D fine, every
# execution fetch hangs).  On recovery, runs the highest-value
# measurements first (driver timeline may cut the tail):
#   1. driver-equivalent warm verification: wiped default-dir cache,
#      stock budgets, extras redirected to /tmp (protects the
#      committed BENCH_EXTRAS.json from a partial record);
#   2. full bench with generous budgets -> refreshes BENCH_EXTRAS.json
#      (warm Pallas headline + Pallas extras);
#   3. profile_mesh XLA (honest multi-SCA-per-chip, VERDICT r4 #5);
#   4. profile_staged stage attribution (fused r_cal_diff 'R');
#   5. profile_stages ablate (frame-IPC in-core A/B, VERDICT r4 #6).
OUT=${ROMAN_BATCH_OUT:-/tmp/tpu_r5b_results.txt}
echo "=== r5b watcher start $(date -u +%H:%M:%S) ===" >> "$OUT"
alive=0
for i in $(seq 1 600); do
  if timeout 300 python -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x + 1).sum())
assert float(f(jnp.ones((128, 128)))) == 2 * 128 * 128
" >/dev/null 2>&1; then
    echo "tpu alive at $(date -u +%H:%M:%S) (attempt $i)" >> "$OUT"
    alive=1
    break
  fi
  sleep 60
done
if [ "$alive" != 1 ]; then
  echo "=== tpu never recovered $(date -u +%H:%M:%S) ===" >> "$OUT"
  exit 1
fi
cd /root/repo
echo "--- 1. driver-equivalent verify $(date -u +%H:%M:%S) ---" >> "$OUT"
rm -rf ~/.cache/romanimpreprocess_tpu/xla
ROMAN_BENCH_EXTRAS_PATH=/tmp/r5b_verify_extras.json \
  timeout 2400 python bench.py >> "$OUT" 2>&1
echo "--- 2. full bench, generous budgets $(date -u +%H:%M:%S) ---" >> "$OUT"
ROMAN_BENCH_PALLAS_BUDGET_S=1500 ROMAN_BENCH_BUDGET_S=7200 \
  timeout 9000 python bench.py >> "$OUT" 2>&1
echo "--- 3. profile_mesh XLA $(date -u +%H:%M:%S) ---" >> "$OUT"
ROMAN_MESH_PALLAS=0 timeout 5400 python tools/profile_mesh.py 4096 2 >> "$OUT" 2>&1
echo "--- 4. profile_staged $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 5400 python tools/profile_staged.py 4096 all >> "$OUT" 2>&1
echo "--- 5. profile_stages ablate $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 7200 python tools/profile_stages.py ablate 4096 >> "$OUT" 2>&1
echo "=== r5b batch done $(date -u +%H:%M:%S) ===" >> "$OUT"
