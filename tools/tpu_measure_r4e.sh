#!/bin/bash
# Round-4e measurement batch: rev-5 evidence chain (frame-resident IPC
# default + bundle disk cache + core-free n_lo=0 chain).
#
# 1. Force-rewarm bench at _BENCH_REV=5: compiles the new Pallas
#    headline/likelihood/exposure programs into the persistent cache
#    and writes the rev-5 prewarm marker.
# 2. Driver-equivalent warm run: MUST land the Pallas headline inside
#    the default 600 s child budget (this is what the driver will do at
#    round end); refreshes BENCH_EXTRAS.json — the committed artifact.
# 3. profile_staged: honest post-DCE-fix R-layer sub-stage attribution
#    with the production frame-IPC backend.
# 4. profile_stages ablate: honest marginals with the frame baseline
#    (+ slab/stream measured back as variants).
OUT=${ROMAN_BATCH_OUT:-/tmp/tpu_r4e_results.txt}
R4C_OUT=/tmp/tpu_r4c_results.txt
R4C_PID=$(cat /tmp/r4c.pid 2>/dev/null)
cd /root/repo
echo "=== r4e armed $(date -u +%H:%M:%S) (waiting on r4c) ===" >> "$OUT"
for i in $(seq 1 720); do
  if grep -q "r4c batch done" "$R4C_OUT" 2>/dev/null; then break; fi
  if [ -n "$R4C_PID" ] && ! kill -0 "$R4C_PID" 2>/dev/null; then break; fi
  sleep 60
done
echo "=== r4e start $(date -u +%H:%M:%S) ===" >> "$OUT"
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
  echo "=== tpu never recovered; r4e skipped $(date -u +%H:%M:%S) ===" >> "$OUT"
  exit 1
fi
echo "--- bench force-pallas (rev-5 rewarm: frame IPC core) $(date -u +%H:%M:%S) ---" >> "$OUT"
ROMAN_BENCH_PALLAS=force ROMAN_BENCH_PALLAS_BUDGET_S=5400 \
  ROMAN_BENCH_BUDGET_S=3000 timeout 10000 python bench.py >> "$OUT" 2>&1
echo "--- bench warm-marker (driver-equivalent; artifact run) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 5000 python bench.py >> "$OUT" 2>&1
echo "--- profile_staged honest (R sub-stages, frame IPC) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 7000 python tools/profile_staged.py >> "$OUT" 2>&1
echo "--- profile_stages ablate honest (frame baseline) $(date -u +%H:%M:%S) ---" >> "$OUT"
timeout 7000 python tools/profile_stages.py ablate >> "$OUT" 2>&1
echo "=== r4e batch done $(date -u +%H:%M:%S) ===" >> "$OUT"
# appended while armed (safe: bash reads forward; nothing above moved)
echo "--- profile_mesh XLA honest retry (kernel-residency trim) $(date -u +%H:%M:%S) ---" >> "$OUT"
ROMAN_MESH_PALLAS=0 timeout 5000 python tools/profile_mesh.py >> "$OUT" 2>&1
echo "=== r4e extended batch done $(date -u +%H:%M:%S) ===" >> "$OUT"
