#!/bin/bash
# Round-5 TPU session #3:
#   1. merit probe verification (kernel C=8 anomaly, parity magnitudes)
#   2. full bench with ILQ_SWEEP_MERIT=kernel (end-to-end truth test)
#   3. queue driver re-measure with fused single-dispatch harvest
#   4. queue driver at device_batch=2048
cd /root/repo || exit 1
LOG=tools/bench_r5c.log

probe() {
  for i in $(seq 1 30); do
    if timeout 90 python -c "import jax.numpy as jnp; print(jnp.ones((8,8)).sum())" >/dev/null 2>&1; then
      return 0
    fi
    echo "probe $i failed; waiting 60s" >> "$LOG"
    sleep 60
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

echo "=== session3 start $(date -u +%FT%TZ) ===" >> "$LOG"
step merit_probe_c python tools/merit_probe_r5c.py
step bench_kernel_merit env ILQ_SWEEP_MERIT=kernel BENCH_BATCH=1024 python bench.py
step bench_queue2_4096 env BENCH_QUEUE=1 BENCH_BATCH=1024 BENCH_TOTAL=4096 BENCH_TPC=10 python bench.py
step bench_queue2_d2048 env BENCH_QUEUE=1 BENCH_BATCH=2048 BENCH_TOTAL=8192 BENCH_TPC=10 python bench.py
echo "=== session3 done $(date -u +%FT%TZ) ===" >> "$LOG"
