#!/bin/bash
# Round-4c measurement batch: re-establish the evidence artifacts on
# the HONEST (all-outputs) chains after the profiler DCE fixes.
#
# 1. bench.py on the warm marker path — the driver-equivalent run whose
#    BENCH_EXTRAS.json (Pallas headline) gets committed.
# 2. profile_mesh XLA-only — honest full-frame mesh numbers (the
#    morning's 39.5/35.8 ms/SCA were slope-only-chain artifacts).
# 3. profile_stages standalone — honest per-stage numbers (the old
#    standalone timers consumed one pixel).
# 4. profile_mesh with Pallas — optional; cold vmapped-Mosaic compiles,
#    bounded hard so an overrun cannot eat the batch.
OUT=${ROMAN_BATCH_OUT:-/tmp/tpu_r4c_results.txt}
cd /root/repo
echo "=== r4c batch start $(date -u +%H:%M:%S) ===" >> "$OUT"
for i in $(seq 1 360); do
  if timeout 300 python -c "
import jax, jax.numpy as jnp
f = jax.jit(lambda x: (x + 1).sum())
assert float(f(jnp.ones((128, 128)))) == 2 * 128 * 128
" >/dev/null 2>&1; then
    echo "tpu alive at $(date -u +%H:%M:%S) (attempt $i)" >> "$OUT"
    alive=1; break
  fi
  sleep 60
done
if [ "$alive" != 1 ]; then
  echo "=== tpu never recovered; r4c skipped $(date -u +%H:%M:%S) ===" >> "$OUT"
  exit 1
fi
echo "--- bench force-pallas (rev-4 chain rewarm: medfit-einsum core) $(date -u +%H:%M:%S) ---" >> "$OUT"
ROMAN_BENCH_PALLAS=force ROMAN_BENCH_PALLAS_BUDGET_S=3600 \
  ROMAN_BENCH_BUDGET_S=1800 timeout 7000 python bench.py >> "$OUT" 2>&1
echo "--- bench warm-marker (driver-equivalent; extras -> BENCH_EXTRAS.json) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 5000 python bench.py >> "$OUT" 2>&1
echo "--- profile_mesh XLA honest (full-frame, 3 legs) $(date -u +%H:%M:%S) ---" >> "$OUT"
ROMAN_MESH_PALLAS=0 timeout 5000 python tools/profile_mesh.py >> "$OUT" 2>&1
echo "--- profile_stages standalone honest $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 5000 python tools/profile_stages.py >> "$OUT" 2>&1
echo "--- profile_mesh Pallas (cold vmapped compiles; bounded) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 7000 python tools/profile_mesh.py >> "$OUT" 2>&1
echo "=== r4c batch done $(date -u +%H:%M:%S) ===" >> "$OUT"
