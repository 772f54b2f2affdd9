#!/bin/bash
# Round-5 TPU session #9 (final): coherent BENCH_ALL on the final
# solver + driver warmups.
cd /root/repo || exit 1
LOG=tools/bench_r5i.log
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
echo "=== session9 start $(date -u +%FT%TZ) ===" >> "$LOG"
step tunnel_health timeout 300 python tools/tunnel_health.py
step benchall_1 env BENCH_CONFIGS=1 python bench_all.py
step benchall_3 env BENCH_CONFIGS=3 python bench_all.py
step benchall_latency env BENCH_CONFIGS=latency LAT_BLOCK=128 python bench_all.py
step benchall_5 env BENCH_CONFIGS=5 ILQ_FUSE_STAGES=0 python bench_all.py
step benchall_2 env BENCH_CONFIGS=2 ILQ_FUSE_STAGES=0 BENCH_BATCH_2PC=256 python bench_all.py
step benchall_4 env BENCH_CONFIGS=4 ILQ_FUSE_STAGES=0 BENCH_BATCH_FLAT=256 python bench_all.py
step bench_default python bench.py
step entry_warm python -c "import jax, __graft_entry__ as g; fn, a = g.entry(); print(jax.jit(fn)(*a))"
echo "=== session9 done $(date -u +%FT%TZ) ===" >> "$LOG"
