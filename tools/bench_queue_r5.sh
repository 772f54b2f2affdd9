#!/bin/bash
# Round-5 sequential TPU bench queue (one process may hold the TPU).
#
# Records the three BENCH_ALL configs that have never had a TPU number
# (VERDICT r4 "What's missing" #1) plus a fresh warm-latency row, in
# risk order (cheapest compile first, the round-4 55-min blocker last).
# Mitigation for the remote-compile ceiling: ILQ_FUSE_STAGES=0 drops the
# per-cost-zoo Mosaic stage kernel from the compile surface (the sweep
# kernel under the ILQ_SWEEP_MERIT=xla default is cost-zoo-free — it
# only emits trajectories), leaving only the problem-dim-sized rollout/
# sweep/LQ kernels to compile. Each config runs as its own process; a
# tunnel probe (CLAUDE.md wedge protocol) gates each launch.
cd /root/repo || exit 1
LOG=tools/bench_all_r05_early.log

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

run_cfg() {
  cfg="$1"; shift
  echo "=== $(date -u +%FT%TZ) config $cfg env: $* ===" >> "$LOG"
  if ! probe; then echo "tunnel dead; skipping $cfg" >> "$LOG"; return 1; fi
  env "$@" BENCH_CONFIGS="$cfg" python bench_all.py >> "$LOG" 2>&1
  echo "=== $(date -u +%FT%TZ) config $cfg rc=$? ===" >> "$LOG"
}

echo "=== queue start $(date -u +%FT%TZ) ===" >> "$LOG"
run_cfg latency LAT_BLOCK=128
run_cfg 5 ILQ_FUSE_STAGES=0
run_cfg 4 ILQ_FUSE_STAGES=0 BENCH_BATCH_FLAT=256
run_cfg 2 ILQ_FUSE_STAGES=0 BENCH_BATCH_2PC=256
echo "=== queue done $(date -u +%FT%TZ) ===" >> "$LOG"
