"""Parallel-in-time Riccati crossover analysis (VERDICT r3 item 4).

Measures, on REAL flagship stage operands (linearize/quadraticize of a
rolled-out operating point):
  1. sweeps-to-tolerance: how many Jacobi sweeps until the pint gains
     match the sequential recursion (max-abs over Ps), per horizon N;
  2. wall time of sequential solve_lq_feedback vs pint at the measured
     sweep count, single instance (the latency use case) — crossover is
     where pint wins.

PINT_PLATFORM=cpu (default) or axon (real TPU; run alone).
Writes tools/pint_crossover.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax

PLATFORM = os.environ.get("PINT_PLATFORM", "cpu")
if PLATFORM == "cpu":
    jax.config.update("jax_platforms", "cpu")
else:
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

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.solver.lq_feedback import solve_lq_feedback
from ilqgames_tpu.solver.lq_pint import solve_lq_feedback_pint

OUT = "/root/repo/tools/pint_crossover.json"
results = {"platform": PLATFORM, "horizons": []}


def operands(N):
    prob = make_problem(num_time_steps=N)
    spec = prob.spec
    op0 = prob.initial_operating_point()
    op = dyn_base.rollout(
        prob.dynamics, spec, prob.x0,
        op0.replace(xs=op0.xs.at[0].set(prob.x0)),
        prob.initial_strategy())
    al = pcost.ALState.init(prob.player_costs, spec)
    _, ek = pcost.total_costs(prob.player_costs, spec, op)
    lin = dyn_base.linearize(prob.dynamics, spec, op)
    quad = pcost.quadraticize(prob.player_costs, spec, op, al, ek)
    x0 = jnp.zeros((spec.xdim,), jnp.float32).at[0].set(0.1)
    return spec, lin, quad, x0


def best_time(f, reps=5):
    r = f(); jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        r = f(); jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
        best = min(best, time.perf_counter() - t0)
    return best


for N in [int(n) for n in os.environ.get(
        "PINT_HORIZONS", "100,400,1600").split(",")]:
    spec, lin, quad, x0 = operands(N)
    seq_j = jax.jit(lambda l, q, x: solve_lq_feedback(spec, l, q, x))
    ref = seq_j(lin, quad, x0)
    refP = np.asarray(ref.strategy.Ps)
    scale = np.abs(refP).max()

    # Sweeps-to-tolerance (bisection-free: scan a ladder of counts).
    sweeps_tol = {}
    ladder = sorted(set(
        [1, 2, 4, 8, 16, 32, 64] + [N // 8, N // 4, N // 2, N - 1]))
    errs = {}
    for m in ladder:
        if m < 1 or m > N - 1:
            continue
        pint_j = jax.jit(
            lambda l, q, x, m=m: solve_lq_feedback_pint(
                spec, l, q, x, num_sweeps=m))
        out = pint_j(lin, quad, x0)
        err = float(np.abs(np.asarray(out.strategy.Ps) - refP).max() / scale)
        errs[m] = err
        for tol in (1e-2, 1e-4):
            if err <= tol and f"{tol:g}" not in sweeps_tol:
                sweeps_tol[f"{tol:g}"] = m
    m_star = sweeps_tol.get("0.0001", N - 1)

    t_seq = best_time(lambda: seq_j(lin, quad, x0))
    pint_star = jax.jit(
        lambda l, q, x: solve_lq_feedback_pint(
            spec, l, q, x, num_sweeps=m_star))
    t_pint = best_time(lambda: pint_star(lin, quad, x0))

    row = {
        "N": N, "rel_err_by_sweeps": {str(k): round(v, 6)
                                      for k, v in errs.items()},
        "sweeps_to_tol": sweeps_tol, "m_star": m_star,
        "t_seq_ms": round(t_seq * 1e3, 3),
        "t_pint_ms": round(t_pint * 1e3, 3),
        "speedup": round(t_seq / t_pint, 3),
    }
    results["horizons"].append(row)
    print(json.dumps(row), flush=True)

with open(OUT, "w") as f:
    json.dump(results, f, indent=2)
print("wrote", OUT)
