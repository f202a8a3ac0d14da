#!/bin/bash
# Wait for the axon TPU backend to recover, then run the measurement
# batch sequentially, appending results to /tmp/tpu_batch_results.txt.
# Jobs must be serial: the relay's compile service is a single global
# queue (one in-flight compile blocks every client).  All compiled
# executables land in the persistent compilation cache
# (utils/compilecache.py), so re-runs of any job are cheap.
OUT=${ROMAN_BATCH_OUT:-/tmp/tpu_batch_results.txt}
echo "=== batch start $(date -u +%H:%M:%S) ===" >> "$OUT"
alive=0
for i in $(seq 1 600); do
  # fetch + assert the computed VALUE: a dispatch-only probe proves the
  # compile path, not execution (on the axon relay a recovering worker
  # can accept dispatch while unable to run — a false 'alive' burns the
  # whole batch through its timeouts; cf. bench._wait_for_backend)
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
  echo "=== tpu never recovered; batch skipped $(date -u +%H:%M:%S) ===" >> "$OUT"
  exit 1
fi
cd /root/repo
echo "--- profile_staged (stages + R sub-stages) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 4500 python tools/profile_staged.py 4096 all >> "$OUT" 2>&1
echo "--- profile_stages ablate (per-stage marginals w/ Pallas) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 4500 python tools/profile_stages.py ablate >> "$OUT" 2>&1
echo "--- profile_fill (fill sub-stages) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 3000 python tools/profile_fill.py >> "$OUT" 2>&1
echo "--- profile_hbm (base-cal ballast sweep) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 3000 python tools/profile_hbm.py >> "$OUT" 2>&1
echo "--- profile_contract $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 3000 python tools/profile_contract.py >> "$OUT" 2>&1
echo "--- profile_mesh (full-frame mesh programs, real chip) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 4500 python tools/profile_mesh.py 4096 2 >> "$OUT" 2>&1
echo "--- bench (warm-cache verification incl. production8 extra) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 4500 python bench.py >> "$OUT" 2>&1
echo "=== batch done $(date -u +%H:%M:%S) ===" >> "$OUT"
