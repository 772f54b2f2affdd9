"""Benchmark: batched three-player-intersection solves per second per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference C++ solver demonstrably completes one warm-started
constrained solve of this problem class in <= 0.25 s on one CPU core
(src/receding_horizon_simulator.cpp:119) — i.e. 4 solves/sec — and our
measured cold-solve time of the unmodified reference binary is recorded in
baselines/ (see baselines/README.md). vs_baseline uses the measured
reference number when available, else the 4 solves/sec budget bound.

The benchmarked work is tolerance-matched: every instance runs the full AL
outer loop + iLQ inner loops to the same iterate budget as the reference
exec main (100 cumulative iLQ iterations, linesearch on).
"""

from __future__ import annotations

import json
import os
import time

import jax

# Persistent compilation cache: full-solve TPU compiles take minutes over
# the axon tunnel; caching makes warmup cheap across bench invocations.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

# The axon tunnel wedges transiently after process crashes; retry init
# instead of failing the bench run.
for _i in range(20):
    try:
        jax.devices()
        break
    except RuntimeError as _e:
        print(f"# device init retry {_i}: {_e}", flush=True)
        time.sleep(15)

import jax.numpy as jnp
import numpy as np


def _reference_baseline():
    """Measured single-core reference stats on the SAME x0 distribution
    this bench runs (baselines/measured.json "perturbed_x0_batch": 256
    instances of the identical RandomState(0) draw through the
    unmodified reference binary — 0.671 s/solve mean; the nominal-x0
    number, 0.447 s, understates the distribution's cost). Returns
    (solves/s, tail dict) where the tail dict carries the reference's
    cost_p50/p95 + diverged_frac so the bench line is self-contained
    evidence of tail parity (the 4-6% diverged lanes are shipped
    reference behavior — baselines/ref_perturbed_first256.jsonl).
    Falls back to the nominal measurement, then the 0.25 s hard
    budget from the reference code."""
    path = os.path.join(os.path.dirname(__file__), "baselines", "measured.json")
    try:
        with open(path) as f:
            data = json.load(f)
        try:
            ref = data["perturbed_x0_batch"]
            tail = {
                "ref_cost_p50": ref["cost_p50"],
                "ref_cost_p95": ref["cost_p95"],
                "ref_diverged_frac": ref["diverged_frac_gt_1e6"],
            }
            return float(ref["solves_per_sec_single_core"]), tail
        except Exception:
            return 1.0 / float(
                data["three_player_intersection"]["mean_solve_s"]), {}
    except Exception:
        return 4.0, {}


def main():
    from ilqgames_tpu.examples.three_player_intersection import make_problem
    from ilqgames_tpu.parallel import mesh as pmesh
    from ilqgames_tpu.solver.params import SolverParams

    problem = make_problem()
    params = SolverParams(
        max_solver_iters=100,
        unconstrained_solver_max_iters=10,
        max_backtracking_steps=100,
        initial_alpha_scaling=0.1,
        convergence_tolerance=1.0,
        expected_decrease_fraction=0.001,
    )

    n_chips = jax.device_count()
    # B=1024 is the measured-best device batch on v5e
    # (tools/tpu_bench_b1024d.log: 49.5 solves/s vs 42.8 at B=512, 31.3
    # at B=256). BENCH_QUEUE=1 enables the wave-refill queue driver
    # (solver/batched.make_host_batched_queue_solver): BENCH_TOTAL
    # instances stream through BENCH_BATCH device lanes, so finished
    # lanes refill instead of idling until the diverged tail's last
    # trip — per-instance results are bitwise identical to the plain
    # driver (tests/test_batched_pallas.py).
    # Default = the measured-best configuration (tools/bench_r5f.log):
    # wave-refill queue, 8192 instances through 2048 device lanes,
    # harvest_block 32, drain compaction — 82.1 solves/s/chip vs 79.3
    # for the best plain run (BENCH_QUEUE=0 BENCH_BATCH=2048).
    queue_mode = os.environ.get("BENCH_QUEUE", "1") == "1"
    device_batch = int(os.environ.get("BENCH_BATCH", "2048"))
    if queue_mode:
        batch = int(os.environ.get("BENCH_TOTAL", str(4 * device_batch)))
    else:
        batch = device_batch * n_chips
    rng = np.random.RandomState(0)
    x0 = np.tile(np.asarray(problem.x0)[None], (batch, 1))
    # Perturb initial positions/speeds so instances are genuinely distinct.
    x0 += 0.1 * rng.randn(*x0.shape).astype(np.float32)

    if queue_mode:
        from ilqgames_tpu.solver import batched as bsolver

        solver = bsolver.make_host_batched_queue_solver(
            problem.dynamics, problem.player_costs, problem.spec, params,
            warm_op=problem.initial_operating_point(),
            warm_strategy=problem.initial_strategy(),
            device_batch=device_batch,
            trips_per_call=int(os.environ.get("BENCH_TPC", "10")),
            harvest_block=int(os.environ.get("BENCH_HARVEST", "32")),
        )
        x0 = jnp.asarray(x0)
    else:
        mesh = pmesh.make_mesh()
        solver = pmesh.make_batched_solver(problem, params, mesh,
                                           host_outer_loop=True)
        x0 = jax.device_put(
            jnp.asarray(x0),
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(pmesh.BATCH_AXIS)
            ),
        )

    # Warmup/compile.
    res = solver(x0)
    jax.block_until_ready(res.op.xs)

    reps = int(os.environ.get("BENCH_REPS", "1"))
    t0 = time.perf_counter()
    for _ in range(reps):
        res = solver(x0)
        jax.block_until_ready(res.op.xs)
    elapsed = (time.perf_counter() - t0) / reps
    if queue_mode and getattr(solver, "last_stats", None):
        print(f"# queue stats: {solver.last_stats}", flush=True)

    solves_per_sec_per_chip = batch / elapsed / n_chips
    baseline, ref_tail = _reference_baseline()
    # Residual evidence backing "tolerance-matched": the batch's final
    # max-constraint-violation distribution and per-player mean costs,
    # against the reference's recorded final state on the same problem
    # (baselines/measured.json: success=0, final_costs — its violation
    # machinery at src/augmented_lagrangian_solver.cpp:116-140).
    mv = np.asarray(res.max_violation)
    costs = np.asarray(res.total_costs)              # [B, P]
    # A lane is "diverged" when any player's final cost exceeds 1e6 —
    # reference-class finals on this problem are ~3e3
    # (baselines/measured.json), so the threshold separates the two
    # populations by >2 orders of magnitude either way. Mean costs are
    # meaningless under a heavy tail (one 1e29 lane dominates 1024), so
    # the recorded statistics are medians/percentiles + the tail size;
    # the reference's own per-instance finals on THIS x0 distribution
    # are in baselines/measured.json ("perturbed_x0_batch").
    worst = costs.max(axis=1)
    diverged = worst > 1e6
    dump = os.environ.get("BENCH_DUMP")
    if dump:
        np.savez(
            dump, x0=np.asarray(x0), costs=costs, max_violation=mv,
            converged=np.asarray(res.converged),
            cumulative_iterations=np.asarray(res.cumulative_iterations),
        )
    print(
        json.dumps(
            {
                "metric": "three_player_intersection_solves_per_sec_per_chip",
                "value": round(solves_per_sec_per_chip, 3),
                "unit": "solves/s/chip",
                "vs_baseline": round(solves_per_sec_per_chip / baseline, 3),
                "viol_p50": round(float(np.percentile(mv, 50)), 4),
                "viol_p95": round(float(np.percentile(mv, 95)), 4),
                "cost_p50": [
                    round(float(c), 1) for c in np.percentile(costs, 50, axis=0)
                ],
                "cost_p95": [
                    round(float(c), 1) for c in np.percentile(costs, 95, axis=0)
                ],
                "diverged_frac": round(float(diverged.mean()), 4),
                **ref_tail,
            }
        )
    )


if __name__ == "__main__":
    main()
