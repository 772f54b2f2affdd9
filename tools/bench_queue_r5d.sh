#!/bin/bash
# Round-5 TPU session #4: queue-driver diagnosis (dispatch counts).
cd /root/repo || exit 1
LOG=tools/bench_r5d.log
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
echo "=== session4 start $(date -u +%FT%TZ) ===" >> "$LOG"
step queue_stats env BENCH_QUEUE=1 BENCH_BATCH=1024 BENCH_TOTAL=4096 BENCH_TPC=10 python bench.py
echo "=== session4 done $(date -u +%FT%TZ) ===" >> "$LOG"
