#!/bin/bash
# Round-5 TPU session #2: throughput levers + probes, sequential.
#   1. flagship B=1024 (fresh baseline on the round-5 code)
#   2. flagship B=2048 (VERDICT lever 2a)
#   3. wave-refill queue: 4096 instances through 1024 lanes (lever 2c)
#   4. merit-backend probe xla/pallas/kernel (VERDICT item 7)
#   5. configs 2+4 re-record with median/diverged stats
cd /root/repo || exit 1
LOG=tools/bench_r5b.log

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

echo "=== session2 start $(date -u +%FT%TZ) ===" >> "$LOG"
step bench_b1024 env BENCH_BATCH=1024 python bench.py
step bench_b2048 env BENCH_BATCH=2048 python bench.py
step bench_queue_4096 env BENCH_QUEUE=1 BENCH_BATCH=1024 BENCH_TOTAL=4096 BENCH_TPC=10 python bench.py
step merit_probe python tools/merit_probe_r5.py
step cfg2_rerecord env ILQ_FUSE_STAGES=0 BENCH_BATCH_2PC=256 BENCH_CONFIGS=2 python bench_all.py
step cfg4_rerecord env ILQ_FUSE_STAGES=0 BENCH_BATCH_FLAT=256 BENCH_CONFIGS=4 python bench_all.py
echo "=== session2 done $(date -u +%FT%TZ) ===" >> "$LOG"
