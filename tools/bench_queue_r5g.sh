#!/bin/bash
# Round-5 TPU session #7: trip decomposition + B=1024 re-measure.
cd /root/repo || exit 1
LOG=tools/bench_r5g.log
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
echo "=== session7 start $(date -u +%FT%TZ) ===" >> "$LOG"
step profile_trip7 python tools/profile_trip7.py
step b1024_remeasure env BENCH_QUEUE=0 BENCH_BATCH=1024 python bench.py
echo "=== session7 done $(date -u +%FT%TZ) ===" >> "$LOG"
