"""Time the three sweep-merit backends in ONE process (VERDICT r4 #7).

Backends (ops/pallas/sweep.py):
  xla    — kernel emits candidate trajectories, XLA computes merits
           (production default; pays the ~1 ms/MB pallas-buffer
           consumption tax, tools/kernel_profile6*.txt)
  pallas — kernel emits, a SECOND reduce-style Pallas kernel consumes
           (pallas->pallas handoffs are exempt from the tax — the one
           untested corner of the design space)
  kernel — in-kernel merit accumulation (no emission; hits the chaotic
           ~100 us/knot Mosaic content cliff on this cost zoo)

Chaotic-timing protocol (CLAUDE.md): all variants measured in the same
process/session, baseline re-measured last; queued calls + single
block_until_ready. Flagship problem, B=1024 (8 blocks of 128), C=1
(the phase-1 chunk) and C=8 (the deep-window chunk).

Output: one JSON line per measurement -> tools/merit_probe_r5.txt.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas import sweep as sweep_mod
from ilqgames_tpu.types import OperatingPoint, Strategy

OUT = open("/root/repo/tools/merit_probe_r5.txt", "a")


def emit(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    OUT.write(line + "\n")
    OUT.flush()


B = 1024
problem = make_problem()
dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec
N, x, P, u = spec.num_time_steps, spec.xdim, spec.num_players, spec.umax

rng = np.random.RandomState(0)
x0 = jnp.asarray(rng.randn(B, x).astype(np.float32))
op = OperatingPoint(
    xs=jnp.asarray(rng.randn(B, N, x).astype(np.float32)),
    us=jnp.asarray(0.01 * rng.randn(B, N, P, u).astype(np.float32)),
    t0=jnp.zeros((B,), jnp.float32),
)
st = Strategy(
    Ps=jnp.asarray(0.01 * rng.randn(B, N, P, u, x).astype(np.float32)),
    alphas=jnp.asarray(0.01 * rng.randn(B, N, P, u).astype(np.float32)),
)
al0 = jax.vmap(lambda _: pcost.ALState.init(costs, spec))(jnp.arange(B))
gate = jnp.ones((B, N, P), jnp.float32)


def timed(backend, C, reps=20):
    scal = jnp.asarray(
        0.1 * 0.5 ** np.arange(C, dtype=np.float32))

    fn = jax.jit(lambda x0_, op_, st_, al_, g_: sweep_mod.sweep_merits_pallas(
        dyn, costs, spec, x0_, op_, st_, scal, al_, g_,
        batch_block=128, merit_backend=backend))
    t0 = time.perf_counter()
    out = fn(x0, op, st, al0, gate)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(x0, op, st, al0, gate)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    emit(backend=backend, C=C, ms=round(ms, 3),
         compile_s=round(compile_s, 1), B=B)
    return np.asarray(out)


for C in (1, 8):
    ref = timed("xla", C)
    pal = timed("pallas", C)
    timed("kernel", C)
    again = timed("xla", C)  # chaos check: baseline re-measured last
    finite = np.isfinite(ref)
    ok = bool(np.allclose(pal[finite], ref[finite], rtol=1e-4, atol=1e-4))
    emit(parity_pallas_vs_xla=ok, C=C)
OUT.close()
