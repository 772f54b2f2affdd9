#!/bin/bash
# Round-5 TPU session #10: phase-1 trajectory-reuse re-roll measurement.
cd /root/repo || exit 1
LOG=tools/bench_r5j.log
probe() {
  for i in $(seq 1 30); do
    if timeout 90 python -c "import jax.numpy as jnp; print(jnp.ones((8,8)).sum())" >/dev/null 2>&1; then return 0; fi
    echo "probe $i failed; waiting 60s" >> "$LOG"; sleep 60
  done
  return 1
}
step() {
  name="$1"; shift
  echo "=== $(date -u +%FT%TZ) $name ===" >> "$LOG"
  if ! probe; then echo "tunnel dead; skipping $name" >> "$LOG"; return 1; fi
  "$@" >> "$LOG" 2>&1
  echo "=== $(date -u +%FT%TZ) $name rc=$? ===" >> "$LOG"
}
echo "=== session10 start $(date -u +%FT%TZ) ===" >> "$LOG"
step b2048_p1reuse env BENCH_QUEUE=0 BENCH_BATCH=2048 python bench.py
step queue_d2048_p1reuse env BENCH_QUEUE=1 BENCH_BATCH=2048 BENCH_TOTAL=8192 BENCH_TPC=10 python bench.py
echo "=== session10 done $(date -u +%FT%TZ) ===" >> "$LOG"
