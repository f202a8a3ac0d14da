#!/bin/bash
# Round-4b measurement batch: honest-chain headline (all outputs
# consumed), the new Pallas kernels (pink fused transform, streaming
# IPC), and the staged-exposure profile with the Pallas fill on.
#
# Order matters: the force-Pallas bench runs FIRST — its success writes
# the prewarm marker that makes the driver's end-of-round bench attempt
# the Pallas headline, which is the round's single most load-bearing
# artifact (rounds 2-3 lost their perf evidence to exactly this).  The
# kernel A/B profiles (pink_pallas, ipc_stream) follow; their cold
# Mosaic compiles land in the persistent cache for the staged-profile
# runs after them.
OUT=${ROMAN_BATCH_OUT:-/tmp/tpu_r4b_results.txt}
cd /root/repo
echo "=== r4b batch start $(date -u +%H:%M:%S) ===" >> "$OUT"
for i in $(seq 1 600); do
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
  echo "=== tpu never recovered; r4b skipped $(date -u +%H:%M:%S) ===" >> "$OUT"
  exit 1
fi
echo "--- bench force-pallas (honest headline + prewarm marker + extras) $(date -u +%H:%M:%S) ---" >> "$OUT"
ROMAN_BENCH_PALLAS=force ROMAN_BENCH_PALLAS_BUDGET_S=3600 \
  ROMAN_BENCH_BUDGET_S=3000 timeout 8000 python bench.py >> "$OUT" 2>&1
echo "--- bench warm verification (marker path, driver-equivalent) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 3000 python bench.py >> "$OUT" 2>&1
echo "--- profile_fill (pink_pallas cold compile + A/B) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 4500 python tools/profile_fill.py 4096 pink,pink_pallas,fill,fill_pallas >> "$OUT" 2>&1
echo "--- profile_stages standalone (ipc_stream cold compile + A/B) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 4500 python tools/profile_stages.py >> "$OUT" 2>&1
echo "--- profile_stages ablate (honest chain attribution) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 6000 python tools/profile_stages.py ablate >> "$OUT" 2>&1
echo "--- profile_staged (stages + R sub-stages, pink pallas on) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 4500 python tools/profile_staged.py 4096 all >> "$OUT" 2>&1
echo "=== r4b batch done $(date -u +%H:%M:%S) ===" >> "$OUT"
