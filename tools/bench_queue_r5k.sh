#!/bin/bash
# Round-5 TPU session #11 (final): reconfirm + re-warm the shipped config.
cd /root/repo || exit 1
LOG=tools/bench_r5k.log
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
echo "=== session11 start $(date -u +%FT%TZ) ===" >> "$LOG"
step tunnel_health timeout 300 python tools/tunnel_health.py
step bench_final python bench.py
step entry_warm python -c "import jax, __graft_entry__ as g; fn, a = g.entry(); print(jax.jit(fn)(*a))"
step tunnel_health_end timeout 300 python tools/tunnel_health.py
echo "=== session11 done $(date -u +%FT%TZ) ===" >> "$LOG"
