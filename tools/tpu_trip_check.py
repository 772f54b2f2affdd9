"""Full-trip parity of the batched machine, fuse_stages ON vs OFF, on
real TPU: same flagship batch, a bounded iterate budget, compare final
operating points / convergence / iteration counts. The stage kernel's
outputs are bitwise vs the XLA stages (tpu_stage_check.txt), so the two
modes should agree bitwise here too.

Appends JSON lines to tools/tpu_trip_check.txt.
"""

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

OUT = os.path.join(os.path.dirname(__file__), "tpu_trip_check.txt")


def record(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def main():
    from ilqgames_tpu.examples.three_player_intersection import make_problem
    from ilqgames_tpu.solver import batched
    from ilqgames_tpu.solver.params import SolverParams

    B = int(os.environ.get("CHECK_BATCH", "128"))
    iters = int(os.environ.get("CHECK_ITERS", "20"))
    problem = make_problem()
    params = SolverParams(
        max_solver_iters=iters,
        unconstrained_solver_max_iters=10,
        max_backtracking_steps=100,
        initial_alpha_scaling=0.1,
        convergence_tolerance=1.0,
        expected_decrease_fraction=0.001,
    )
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(
        np.tile(np.asarray(problem.x0)[None], (B, 1))
        + 0.1 * rng.randn(B, problem.spec.xdim).astype(np.float32))

    results = {}
    for fuse in (False, True):
        run = batched.make_host_batched_solver(
            problem.dynamics, problem.player_costs, problem.spec, params,
            warm_op=problem.initial_operating_point(),
            warm_strategy=problem.initial_strategy(),
            trips_per_call=10, batch_block=128, fuse_stages=fuse,
        )
        t0 = time.time()
        res = run(x0)
        jax.block_until_ready(res.op.xs)
        compile_s = time.time() - t0
        t0 = time.time()
        res = run(x0)
        jax.block_until_ready(res.op.xs)
        run_s = time.time() - t0
        results[fuse] = res
        record(stage=f"trip_fuse_{int(fuse)}", B=B, iters=iters,
               compile_s=round(compile_s, 1), run_s=round(run_s, 3),
               converged=round(float(jnp.mean(
                   res.converged.astype(jnp.float32))), 4),
               mean_iters=round(float(jnp.mean(
                   res.cumulative_iterations.astype(jnp.float32))), 2))

    a, b = results[False], results[True]
    record(stage="trip_parity",
           dxs=float(jnp.max(jnp.abs(a.op.xs - b.op.xs))),
           dus=float(jnp.max(jnp.abs(a.op.us - b.op.us))),
           dviol=float(jnp.max(jnp.abs(a.max_violation
                                       - b.max_violation))),
           diters=int(jnp.max(jnp.abs(
               a.cumulative_iterations - b.cumulative_iterations))),
           dconv=int(jnp.sum(a.converged != b.converged)))
    record(stage="done")


if __name__ == "__main__":
    main()
