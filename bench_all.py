"""All-config benchmark suite: one JSON line per BASELINE benchmark config.

BASELINE.md's five configs:
  1. two-player LQ point-mass game        (reference python prototype)
  2. two-player unicycle-4D collision     (two_player_collision, 10 s)
  3. three-player intersection            (full cost zoo; also bench.py)
  4. three-player flat intersection       (feedback-linearized)
  5. receding-horizon AL reachability batch (1k initial states,
     three_player_collision_avoidance_reachability +
     src/receding_horizon_simulator.cpp:65-139)

Each line: {"metric", "value", "unit", "vs_baseline", ...extras}.
vs_baseline uses baselines/measured.json entries where the unmodified
reference binary was measured; configs the reference cannot run as
shipped fall back to the 0.25 s/solve receding-horizon budget (4
solves/s, src/receding_horizon_simulator.cpp:119).

Env knobs: BENCH_BATCH (per-chip batch for configs 1-4, default 256),
BENCH_RH_BATCH (config 5 initial states, default 1000), BENCH_CONFIGS
(comma list like "1,3,5", default all), BENCH_BACKEND (auto|pallas|xla).
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

for _i in range(20):
    try:
        jax.devices()
        break
    except RuntimeError as _e:
        time.sleep(15)

import jax.numpy as jnp
import numpy as np


def _measured():
    path = os.path.join(os.path.dirname(__file__), "baselines",
                        "measured.json")
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:  # noqa: BLE001
        return {}


def _baseline_solves_per_sec(measured, key):
    try:
        return 1.0 / float(measured[key]["mean_solve_s"])
    except Exception:  # noqa: BLE001
        return 4.0  # 0.25 s/solve receding-horizon budget


def _exec_params(**over):
    from ilqgames_tpu.solver.params import SolverParams

    kw = dict(
        max_solver_iters=100,
        unconstrained_solver_max_iters=10,
        max_backtracking_steps=100,
        initial_alpha_scaling=0.1,
        convergence_tolerance=1.0,
        expected_decrease_fraction=0.001,
    )
    kw.update(over)
    return SolverParams(**kw)


def _x0_batch(problem, B, scale=0.1):
    rng = np.random.RandomState(0)
    x0 = np.tile(np.asarray(problem.x0)[None], (B, 1))
    x0 += scale * rng.randn(*x0.shape).astype(np.float32)
    return jnp.asarray(x0)


def bench_solver_config(name, example, params, batch, backend, extras=None):
    import ilqgames_tpu.examples as ex
    from ilqgames_tpu.parallel import mesh as pmesh

    problem = ex.get(example)()
    n_chips = jax.device_count()
    B = batch * n_chips
    mesh = pmesh.make_mesh()
    solver = pmesh.make_batched_solver(
        problem, params, mesh, host_outer_loop=True, backend=backend)
    x0 = _x0_batch(problem, B)

    res = solver(x0)  # warmup/compile
    jax.block_until_ready(res.op.xs)
    reps = int(os.environ.get("BENCH_REPS", "1"))
    t0 = time.perf_counter()
    for _ in range(reps):
        res = solver(x0)
        jax.block_until_ready(res.op.xs)
    elapsed = (time.perf_counter() - t0) / reps

    sps = B / elapsed / n_chips
    out = {
        "metric": f"{example}_solves_per_sec_per_chip",
        "value": round(sps, 3),
        "unit": "solves/s/chip",
        "vs_baseline": round(sps / _baseline_solves_per_sec(
            _measured(), example), 3),
        "batch": B,
        "converged_frac": round(float(jnp.mean(
            res.converged.astype(jnp.float32))), 3),
    }
    if extras:
        out.update(extras)
    return out


def bench_receding_horizon(batch, backend):
    """Config 5: batched receding-horizon AL reachability
    (src/three_player_collision_avoidance_reachability_example.cpp:188-220
    + src/receding_horizon_simulator.cpp:65-139)."""
    import ilqgames_tpu.examples as ex
    from ilqgames_tpu.runtime import receding_horizon as rh

    problem = ex.get("three_player_collision_avoidance_reachability")()
    params = _exec_params()
    x0 = _x0_batch(problem, batch, scale=0.25)

    t0 = time.perf_counter()
    states, times, _ = rh.simulate_batched(
        problem, params, x0, final_time=10.0, replan_interval=0.25,
        backend=backend,
    )
    jax.block_until_ready(states)
    elapsed = time.perf_counter() - t0
    n_cycles = states.shape[0] - 1
    total_solves = batch * (n_cycles + 1)  # initial solve + replans
    n_chips = jax.device_count()
    sps = total_solves / elapsed / n_chips
    # Reference contract: one warm re-solve per 0.25 s sim step on one
    # core => 4 solves/s hard budget.
    return {
        "metric": "receding_horizon_reachability_warm_solves_per_sec_per_chip",
        "value": round(sps, 3),
        "unit": "solves/s/chip",
        "vs_baseline": round(sps / 4.0, 3),
        "batch": batch,
        "cycles": int(n_cycles),
        "wall_s": round(elapsed, 1),
    }


def main():
    backend = os.environ.get("BENCH_BACKEND", "auto")
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    rh_batch = int(os.environ.get("BENCH_RH_BATCH", "1000"))
    which = set(
        os.environ.get("BENCH_CONFIGS", "1,2,3,4,5").split(","))

    runs = []
    if "1" in which:
        runs.append(lambda: bench_solver_config(
            "point_mass", "two_player_point_mass", _exec_params(), batch,
            backend))
    if "2" in which:
        runs.append(lambda: bench_solver_config(
            "collision", "two_player_collision", _exec_params(), batch,
            backend))
    if "3" in which:
        runs.append(lambda: bench_solver_config(
            "intersection", "three_player_intersection", _exec_params(),
            batch, backend))
    if "4" in which:
        runs.append(lambda: bench_solver_config(
            "flat_intersection", "three_player_flat_intersection",
            _exec_params(), batch, backend))
    if "5" in which:
        runs.append(lambda: bench_receding_horizon(rh_batch, backend))

    for run in runs:
        try:
            print(json.dumps(run()), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"metric": "error", "value": 0,
                              "unit": str(type(e).__name__),
                              "vs_baseline": 0,
                              "detail": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
