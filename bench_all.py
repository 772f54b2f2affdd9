"""All five BASELINE benchmark configs on TPU, one JSON line each.

Configs (BASELINE.md benchmark list):
  1. two_player_point_mass      — the 2-player LQ point-mass game
                                  (python/test_two_player_point_mass.py)
  2. two_player_collision       — src/two_player_collision_example.cpp
                                  (broken as shipped upstream — see
                                  baselines/measured.json; we bench our
                                  throughput on it anyway)
  3. three_player_intersection  — the flagship (measured reference
                                  baseline 2.24 solves/s single core)
  4. three_player_flat_intersection — feedback-linearized variant
                                  (upstream binary segfaults as shipped;
                                  fixed harness in baselines/)
  5. receding_horizon_reachability_1k — 1000-initial-state receding-
                                  horizon AL reachability batch
                                  (src/three_player_collision_avoidance_
                                  reachability_example.cpp:188-220 +
                                  src/receding_horizon_simulator.cpp:65-139).
                                  Reference contract: one warm replan per
                                  instance per 0.25 s => 4 replans/s.

Also emits warm single-solve latency p50/p95 (the reference's hard
real-time budget is 0.25 s/solve, src/receding_horizon_simulator.cpp:119).

Each config prints {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is null where the reference has no runnable counterpart.

Run: python bench_all.py            (all configs)
     BENCH_CONFIGS=1,3 python bench_all.py
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

for _i in range(20):
    try:
        jax.devices()
        break
    except RuntimeError as _e:  # wedged tunnel: wait and retry
        print(f"init retry {_i}: {_e}", flush=True)
        time.sleep(15)

import jax.numpy as jnp
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def _exec_params(**over):
    from ilqgames_tpu.solver.params import SolverParams

    base = dict(
        max_solver_iters=100,
        unconstrained_solver_max_iters=10,
        max_backtracking_steps=100,
        initial_alpha_scaling=0.1,
        convergence_tolerance=1.0,
        expected_decrease_fraction=0.001,
    )
    base.update(over)
    return SolverParams(**base)


def _perturbed_x0(problem, B, sigma=0.1, seed=0):
    rng = np.random.RandomState(seed)
    x0 = np.tile(np.asarray(problem.x0)[None], (B, 1))
    return jnp.asarray(
        x0 + sigma * rng.randn(*x0.shape).astype(np.float32))


def _throughput(problem, params, B, batch_block=128, trips_per_call=20,
                sigma=0.1):
    """Warm+timed batched solve; returns (solves/s/chip, stats)."""
    from ilqgames_tpu.solver import batched

    x0 = _perturbed_x0(problem, B, sigma)
    run = batched.make_host_batched_solver(
        problem.dynamics, problem.player_costs, problem.spec, params,
        warm_op=problem.initial_operating_point(),
        warm_strategy=problem.initial_strategy(),
        trips_per_call=trips_per_call, batch_block=batch_block,
    )
    res = run(x0)
    jax.block_until_ready(res.op.xs)  # compile+warm
    t0 = time.perf_counter()
    res = run(x0)
    jax.block_until_ready(res.op.xs)
    dt = time.perf_counter() - t0
    # Residual evidence for "tolerance-matched" (VERDICT r2 #5): the
    # batch's final max-constraint-violation distribution and per-player
    # mean costs, comparable against the reference's recorded final state
    # (baselines/measured.json final_costs; its violation machinery:
    # src/augmented_lagrangian_solver.cpp:116-140).
    mv = np.asarray(res.max_violation)
    costs = np.asarray(res.total_costs)
    stats = dict(
        B=B, wall_s=round(dt, 2),
        converged=round(float(jnp.mean(res.converged.astype(jnp.float32))), 4),
        mean_iters=round(float(jnp.mean(
            res.cumulative_iterations.astype(jnp.float32))), 1),
        # Medians/percentiles, not means: a single diverged lane (the
        # reference's own failure mode on several of these configs —
        # baselines/measured.json) makes a mean meaningless.
        cost_p50=[round(float(c), 1)
                  for c in np.percentile(costs, 50, axis=0)],
        cost_p95=[round(float(c), 1)
                  for c in np.percentile(costs, 95, axis=0)],
        diverged_frac=round(float((costs.max(axis=1) > 1e6).mean()), 4),
    )
    if np.isfinite(mv).any():  # unconstrained problems have no violation
        stats.update(
            viol_p50=round(float(np.percentile(mv, 50)), 4),
            viol_p95=round(float(np.percentile(mv, 95)), 4),
            viol_max=round(float(mv.max()), 4),
        )
    return B / dt, stats


def config1_point_mass():
    """2-player LQ point-mass game. One LQ step is exact, but the
    exec-params ladder's FIRST candidate is alpha0=0.1, so every
    accepted iteration moves only 10% toward the Nash fixed point and
    the merit contracts ~0.86x/iter; |delta merit| < tol therefore needs
    ~ln(merit0)/0.15 iterations, and sigma=0.5 draws with merit0 >~ 300
    cannot converge in 20 (the round-2/4 converged=0.57 rows). Measured
    analysis: tools/pm_convergence_r5.json — at 40 iters 100% of lanes
    converge, and a full-step alpha0=1.0 run converges 100% in exactly
    2 iterations (solver is exact on LQ; the slow march is the
    reference's own ladder semantics). Cap is 40 so the recorded row
    converges fully."""
    from ilqgames_tpu.examples.two_player_point_mass import make_problem

    problem = make_problem()
    iters = int(os.environ.get("BENCH_PM_ITERS", "40"))
    params = _exec_params(max_solver_iters=iters,
                          unconstrained_solver_max_iters=iters)
    B = int(os.environ.get("BENCH_BATCH_PM", "1024"))
    sps, stats = _throughput(problem, params, B, sigma=0.5)
    emit(metric="two_player_point_mass_solves_per_sec_per_chip",
         value=round(sps, 2), unit="solves/s/chip", vs_baseline=None,
         note="no reference C++ counterpart (python prototype only); "
              "convergence-vs-iteration-cap analysis: "
              "tools/pm_convergence_r5.json (100% at 40 iters; "
              "alpha0=0.1 ladder semantics, not a solver defect)",
         **stats)


def config2_two_player_collision():
    """two_player_collision with intersection exec params. The unmodified
    reference dies after 2 iterates on this example under every param set
    (baselines/measured.json two_player_collision); our solver reproduces
    that failure mode, so the bench measures throughput of the attempt."""
    from ilqgames_tpu.examples.two_player_collision import make_problem

    problem = make_problem()
    params = _exec_params()
    B = int(os.environ.get("BENCH_BATCH_2PC", "256"))
    sps, stats = _throughput(problem, params, B)
    emit(metric="two_player_collision_solves_per_sec_per_chip",
         value=round(sps, 2), unit="solves/s/chip", vs_baseline=None,
         note="reference broken as shipped (immediate linesearch failure)",
         **stats)


def config3_intersection():
    from ilqgames_tpu.examples.three_player_intersection import make_problem

    problem = make_problem()
    params = _exec_params()
    B = int(os.environ.get("BENCH_BATCH", "1024"))
    sps, stats = _throughput(problem, params, B)
    # Distribution-matched measured baseline: the unmodified reference on
    # the same perturbed-x0 draw (baselines/measured.json
    # perturbed_x0_batch.solves_per_sec_single_core).
    try:
        with open(os.path.join(os.path.dirname(__file__), "baselines",
                               "measured.json")) as f:
            ref = float(json.load(f)["perturbed_x0_batch"]
                        ["solves_per_sec_single_core"])
    except Exception:
        ref = 2.24  # nominal-x0 fallback (mean_solve_s=0.447)
    emit(metric="three_player_intersection_solves_per_sec_per_chip",
         value=round(sps, 2), unit="solves/s/chip",
         vs_baseline=round(sps / ref, 2), **stats)


def config4_flat_intersection():
    """Flat (feedback-linearized) intersection. Upstream exec segfaults as
    shipped (dynamics_ member shadowing, baselines/measured.json
    flat_examples); the fixed harness converges to a poor stationary point.
    We bench our throughput at the same exec params."""
    from ilqgames_tpu.examples.three_player_flat_intersection import \
        make_problem

    problem = make_problem()
    params = _exec_params()
    B = int(os.environ.get("BENCH_BATCH_FLAT", "256"))
    sps, stats = _throughput(problem, params, B, sigma=0.1)
    emit(metric="three_player_flat_intersection_solves_per_sec_per_chip",
         value=round(sps, 2), unit="solves/s/chip", vs_baseline=None,
         note="upstream binary segfaults as shipped; no reference number",
         **stats)


def config5_receding_horizon_1k():
    """BASELINE config 5: 1000-initial-state receding-horizon AL
    reachability batch. Metric: warm replans/s/chip across the whole
    batch; reference contract is 4 replans/s/instance on one core."""
    from ilqgames_tpu.examples.reachability import \
        make_three_player_collision_avoidance
    from ilqgames_tpu.runtime.receding_horizon import simulate_batched

    problem = make_three_player_collision_avoidance()
    params = _exec_params(
        max_solver_iters=int(os.environ.get("RH_ITERS", "20")),
        unconstrained_solver_max_iters=10,
    )
    B = int(os.environ.get("BENCH_BATCH_RH", "1000"))
    final_time = float(os.environ.get("RH_FINAL_TIME", "2.0"))
    x0 = _perturbed_x0(problem, B, sigma=0.25)

    t0 = time.perf_counter()
    states, times, _ = simulate_batched(
        problem, params, x0, final_time=final_time,
        replan_interval=0.25, backend="auto",
        batch_block=int(os.environ.get("CHECK_BLOCK", "128")),
    )
    jax.block_until_ready(states)
    cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    states, times, _ = simulate_batched(
        problem, params, x0, final_time=final_time,
        replan_interval=0.25, backend="auto",
        batch_block=int(os.environ.get("CHECK_BLOCK", "128")),
    )
    jax.block_until_ready(states)
    dt = time.perf_counter() - t0

    n_cycles = len(times) - 1
    replans = B * n_cycles
    rps = replans / dt
    emit(metric="receding_horizon_reachability_replans_per_sec_per_chip",
         value=round(rps, 1), unit="replans/s/chip",
         vs_baseline=round(rps / 4.0, 1),
         B=B, cycles=n_cycles, wall_s=round(dt, 2),
         cold_s=round(cold, 1),
         note="baseline = reference hard budget 0.25 s/replan/instance "
              "(src/receding_horizon_simulator.cpp:119)")


def latency_single_solve():
    """Warm-started single-instance solve latency p50/p95 vs the 0.25 s
    receding-horizon contract. Uses the batched machine at B=1 (one
    padded lane block — the latency configuration, not throughput)."""
    from ilqgames_tpu.examples.three_player_intersection import make_problem
    from ilqgames_tpu.solver import batched

    problem = make_problem()
    # Warm replans get a small budget (the reference gives them
    # unconstrained_solver_max_iters per AL round within 0.25 s).
    params = _exec_params(max_solver_iters=20)
    run = batched.make_host_batched_warm_solver(
        problem.dynamics, problem.player_costs, problem.spec, params,
        trips_per_call=20,
        batch_block=int(os.environ.get("LAT_BLOCK", "8")),
    )
    # Solve once cold to get a converged warm start.
    from ilqgames_tpu.costs import player_cost as pcost
    cold_params = _exec_params()
    run_cold = batched.make_host_batched_solver(
        problem.dynamics, problem.player_costs, problem.spec, cold_params,
        warm_op=problem.initial_operating_point(),
        warm_strategy=problem.initial_strategy(),
        trips_per_call=20,
        batch_block=int(os.environ.get("LAT_BLOCK", "8")),
    )
    x0 = problem.x0[None]
    res0 = run_cold(x0)
    jax.block_until_ready(res0.op.xs)

    # Replan from a slightly advanced state, warm-started on the solution.
    x1 = res0.op.xs[:, 2]
    lat = []
    for _ in range(int(os.environ.get("LAT_REPS", "20"))):
        t0 = time.perf_counter()
        res = run(x1, res0.op, res0.strategy, res0.al_state)
        jax.block_until_ready(res.op.xs)
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat[1:])  # drop the first (jit-dispatch warm)
    p50, p95 = float(np.percentile(lat, 50)), float(np.percentile(lat, 95))
    emit(metric="warm_single_solve_latency_p50", value=round(p50, 4),
         unit="s", vs_baseline=round(0.25 / p50, 1),
         p95=round(p95, 4),
         note="baseline = reference 0.25 s hard replan budget")


CONFIGS = {
    "1": config1_point_mass,
    "2": config2_two_player_collision,
    "3": config3_intersection,
    "4": config4_flat_intersection,
    "5": config5_receding_horizon_1k,
    "latency": latency_single_solve,
}


def main():
    which = os.environ.get("BENCH_CONFIGS", "1,2,3,4,5,latency").split(",")
    for key in which:
        key = key.strip()
        try:
            CONFIGS[key]()
        except Exception as e:  # keep emitting the rest
            emit(metric=f"config_{key}", error=str(e)[:500])


if __name__ == "__main__":
    main()
