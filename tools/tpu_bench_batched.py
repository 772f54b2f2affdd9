"""End-to-end TPU benchmark of the batched Pallas solver on the flagship
problem (exec-main parameters, full budgets) + per-trip timing.

Writes JSON lines to tools/tpu_bench_batched.txt.
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

for _i in range(20):
    try:
        jax.devices()
        break
    except RuntimeError as e:
        print(f"init retry {_i}: {e}", flush=True)
        time.sleep(15)

import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "tpu_bench_batched.txt")


def record(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    from ilqgames_tpu.examples.three_player_intersection import make_problem
    from ilqgames_tpu.solver import batched
    from ilqgames_tpu.solver.params import SolverParams

    B = int(os.environ.get("BENCH_BATCH", "256"))
    Bb = int(os.environ.get("CHECK_BLOCK", "128"))
    tpc = int(os.environ.get("TRIPS_PER_CALL", "20"))
    problem = make_problem()
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec
    params = SolverParams(
        max_solver_iters=100,
        unconstrained_solver_max_iters=10,
        max_backtracking_steps=100,
        initial_alpha_scaling=0.1,
        convergence_tolerance=1.0,
        expected_decrease_fraction=0.001,
    )

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(
        np.tile(np.asarray(problem.x0)[None], (B, 1))
        + 0.1 * rng.randn(B, spec.xdim).astype(np.float32)
    )

    run = batched.make_host_batched_solver(
        dyn, costs, spec, params,
        warm_op=problem.initial_operating_point(),
        warm_strategy=problem.initial_strategy(),
        trips_per_call=tpc, batch_block=Bb,
    )

    t0 = time.perf_counter()
    res = run(x0)
    jax.block_until_ready(res.op.xs)
    warm_elapsed = time.perf_counter() - t0
    record(stage="first_run_incl_compile", s=round(warm_elapsed, 1),
           converged=float(jnp.mean(res.converged.astype(jnp.float32))),
           mean_iters=float(jnp.mean(
               res.cumulative_iterations.astype(jnp.float32))))

    t0 = time.perf_counter()
    res = run(x0)
    jax.block_until_ready(res.op.xs)
    elapsed = time.perf_counter() - t0
    sps = B / elapsed
    record(stage="batched_solve", B=B, wall_s=round(elapsed, 2),
           solves_per_sec_per_chip=round(sps, 2),
           vs_ref_2p24=round(sps / 2.24, 1),
           converged=float(jnp.mean(res.converged.astype(jnp.float32))),
           mean_iters=float(jnp.mean(
               res.cumulative_iterations.astype(jnp.float32))))

    record(stage="done")


if __name__ == "__main__":
    main()
