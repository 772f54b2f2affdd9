"""Production-kernel cost model AFTER the de-stacked merit core (round 4).

Times the actual production kernels (ops/pallas/{sweep,stage,lq}.py) on
real flagship operands at the bench's shapes. Reports per-call and
per-knot-per-block costs:

  sweep_c8      sweep_merits_bm, C=8, one 128-lane block (deep round)
  sweep_c1_full sweep_merits_bm, C=1, full B=1024 (phase-1 first chunk)
  sweep_c8_full sweep_merits_bm, C=8, full B=1024 (phase-1 at default
                linesearch_chunk)
  reroll_full   rollout_bm, full B=1024 (selected-candidate re-roll)
  stage_full    lin_quad_pallas, full B=1024
  lq_full       solve_lq_feedback_bm, full B=1024

JSON to tools/kernel_profile6.txt. Run alone on the TPU.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
for _i in range(20):
    try:
        jax.devices(); break
    except RuntimeError:
        time.sleep(15)

import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas.stage import lin_quad_pallas
from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_bm
from ilqgames_tpu.ops.pallas.sweep import (rollout_bm, sweep_merits_bm)

OUT = "/root/repo/tools/kernel_profile6.txt"
B = int(os.environ.get("KP_BATCH", "1024"))
Bb = 128


def rec(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def timeit(fn, *args, reps=20):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return compile_s, (time.perf_counter() - t0) / reps


problem = make_problem()
dyn, spec, pcs = problem.dynamics, problem.spec, problem.player_costs
N = spec.num_time_steps
x = spec.xdim
P = spec.num_players
u = spec.umax
Pu = P * u
rng = np.random.RandomState(0)

n_sc = [len(pc.state_constraints) for pc in pcs]
nS = sum(n_sc)


def operands(Bn):
    op = {
        "xs": jnp.asarray(rng.randn(N, x, Bn).astype(np.float32)),
        "us": jnp.asarray(
            0.01 * rng.randn(N, Pu, Bn).astype(np.float32)),
        "t0": jnp.zeros((1, Bn), jnp.float32),
    }
    st = {
        "Ps": jnp.asarray(
            0.01 * rng.randn(N, Pu, x, Bn).astype(np.float32)),
        "alphas": jnp.asarray(
            0.01 * rng.randn(N, Pu, Bn).astype(np.float32)),
    }
    x0m = jnp.asarray(rng.randn(x, Bn).astype(np.float32))
    lamS = jnp.asarray(0.1 * rng.rand(N, nS, Bn).astype(np.float32))
    mu = 10.0 * jnp.ones((1, Bn), jnp.float32)
    gate = jnp.ones((N, P, Bn), jnp.float32)
    return op, st, x0m, lamS, mu, gate


def sweep_case(name, C, Bn):
    op, st, x0m, lamS, mu, gate = operands(Bn)
    scal = jnp.broadcast_to(
        jnp.asarray(0.1 * 0.5 ** np.arange(C, dtype=np.float32))[:, None],
        (C, Bn))
    f = jax.jit(lambda *a: sweep_merits_bm(
        dyn, pcs, spec, a[0], a[1], a[2], a[3], a[4], None, a[5], a[6],
        batch_block=Bb))
    cs, rs = timeit(f, x0m, op, st, scal, lamS, mu, gate)
    nb = Bn // Bb
    rec(stage=name, compile_s=round(cs, 1), per_call_ms=round(rs * 1e3, 2),
        us_per_knot_block=round(rs / N / nb * 1e6, 2))


sweep_case("sweep_c8", 8, 128)
sweep_case("sweep_c1_full", 1, B)
sweep_case("sweep_c8_full", 8, B)

op, st, x0m, lamS, mu, gate = operands(B)
scal1 = 0.5 * jnp.ones((1, B), jnp.float32)
f = jax.jit(lambda *a: rollout_bm(dyn, spec, a[0], a[1], a[2], a[3],
                                  batch_block=Bb))
cs, rs = timeit(f, x0m, op, st, scal1)
rec(stage="reroll_full", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 2),
    us_per_knot_block=round(rs / N / (B // Bb) * 1e6, 2))

f = jax.jit(lambda *a: lin_quad_pallas(
    dyn, pcs, spec, a[0], a[1], None, a[2], a[3], batch_block=Bb))
cs, rs = timeit(f, op, lamS, mu, gate)
rec(stage="stage_full", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 2),
    us_per_knot_block=round(rs / N / (B // Bb) * 1e6, 2))

ops_lin = jax.jit(lambda *a: lin_quad_pallas(
    dyn, pcs, spec, a[0], a[1], None, a[2], a[3], batch_block=Bb))(
        op, lamS, mu, gate)
jax.block_until_ready(ops_lin)
dx0 = x0m - op["xs"][0]
f = jax.jit(lambda o, d: solve_lq_feedback_bm(
    spec, o, d, adaptive_regularization=False, batch_block=Bb))
cs, rs = timeit(f, ops_lin, dx0)
rec(stage="lq_full", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 2),
    us_per_knot_block=round(rs / N / (B // Bb) * 1e6, 2))

rec(stage="done")
