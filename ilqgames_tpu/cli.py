"""Command-line entry point mirroring the reference exec binaries
(exec/*/main.cpp, SURVEY.md §2.12): pick an example, set solver flags,
solve, run Nash checks, optionally save the log and render a plot.

    python -m ilqgames_tpu --example three_player_intersection --save
    python -m ilqgames_tpu --list

Net-new beyond the reference: --batch N solves N perturbed instances in
parallel on the available devices.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(
        prog="ilqgames_tpu",
        description="TPU-native N-player differential game solver",
    )
    p.add_argument("--example", default="three_player_intersection",
                   help="example problem name (see --list)")
    p.add_argument("--list", action="store_true", help="list examples")
    # Reference exec flags (exec/three_player_intersection/main.cpp:64-78).
    p.add_argument("--open_loop", action="store_true",
                   help="use open-loop (vs feedback) solver")
    p.add_argument("--no_linesearch", action="store_true")
    p.add_argument("--initial_alpha_scaling", type=float, default=0.1)
    p.add_argument("--convergence_tolerance", type=float, default=1.0)
    p.add_argument("--expected_decrease", type=float, default=0.001)
    p.add_argument("--max_solver_iters", type=int, default=100)
    p.add_argument("--unconstrained_solver_max_iters", type=int, default=10)
    p.add_argument("--max_backtracking_steps", type=int, default=100)
    p.add_argument("--save", action="store_true", help="save solver log")
    p.add_argument("--experiment_name", default=None)
    p.add_argument("--html", default=None, metavar="PATH",
                   help="write a scrubable HTML animation of the solve "
                        "(iterate + time sliders; the reference GUI's "
                        "capability as a headless artifact)")
    p.add_argument("--viz", action="store_true",
                   help="save a top-down trajectory plot (PNG)")
    p.add_argument("--check_nash", action="store_true",
                   help="run the numerical local-Nash check")
    p.add_argument("--batch", type=int, default=0,
                   help="solve a batch of perturbed instances in parallel")
    p.add_argument("--num_time_steps", type=int, default=None)
    # Receding-horizon mode (reference exec/receding_horizon_example).
    p.add_argument("--receding_horizon", action="store_true",
                   help="run the fixed-cadence receding-horizon simulator")
    p.add_argument("--safety_example", default=None,
                   help="run the minimally-invasive dual-solver simulator "
                        "with this example as the safety problem "
                        "(e.g. three_player_intersection_reachability)")
    p.add_argument("--final_time", type=float, default=10.0)
    p.add_argument("--replan_interval", type=float, default=0.25)
    p.add_argument("--planner_runtime", type=float, default=0.25)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import ilqgames_tpu.examples as examples

    if args.list:
        for name in examples.names():
            print(name)
        return 0

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ilqgames_tpu.solver.params import SolverParams

    params = SolverParams(
        open_loop=args.open_loop,
        linesearch=not args.no_linesearch,
        initial_alpha_scaling=args.initial_alpha_scaling,
        convergence_tolerance=args.convergence_tolerance,
        expected_decrease_fraction=args.expected_decrease,
        max_solver_iters=args.max_solver_iters,
        unconstrained_solver_max_iters=args.unconstrained_solver_max_iters,
        max_backtracking_steps=args.max_backtracking_steps,
    )
    problem = examples.get(args.example)(num_time_steps=args.num_time_steps)

    if args.batch:
        from ilqgames_tpu.parallel import mesh as pmesh

        rng = np.random.RandomState(0)
        x0 = np.tile(np.asarray(problem.x0)[None], (args.batch, 1))
        x0 += 0.1 * rng.randn(*x0.shape).astype(np.float32)
        t0 = time.perf_counter()
        res = pmesh.solve_batched(problem, params, jnp.asarray(x0))
        jax.block_until_ready(res.op.xs)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "example": args.example,
            "batch": args.batch,
            "wall_s": round(dt, 3),
            "num_converged": int(np.asarray(res.converged).sum()),
            "max_violation": float(np.asarray(res.max_violation).max()),
        }))
        return 0

    if args.safety_example:
        from ilqgames_tpu.runtime import receding_horizon as rh

        safety = examples.get(args.safety_example)(
            num_time_steps=args.num_time_steps
        )
        t0 = time.perf_counter()
        xs, ts, flags, state = rh.simulate_minimally_invasive(
            problem, safety, params, final_time=args.final_time,
            replan_interval=args.replan_interval,
            planner_time=args.planner_runtime,
        )
        jax.block_until_ready(xs)
        n_safety = int(np.asarray(flags).sum())
        print(f"Simulated {float(ts[-1]):.2f} s "
              f"({int(state.num_replans)} replans, safety controller active "
              f"{n_safety}x) in {time.perf_counter() - t0:.2f} s wall.")
        return 0

    if args.receding_horizon:
        from ilqgames_tpu.runtime import receding_horizon as rh

        t0 = time.perf_counter()
        xs, ts, state = rh.simulate(
            problem, params, final_time=args.final_time,
            replan_interval=args.replan_interval,
            planner_time=args.planner_runtime,
        )
        jax.block_until_ready(xs)
        print(f"Simulated {float(ts[-1]):.2f} s of sim time "
              f"({int(state.num_replans)} replans) in "
              f"{time.perf_counter() - t0:.2f} s wall.")
        print("Final state:", np.asarray(xs[-1]))
        return 0

    t0 = time.perf_counter()
    res = problem.solve(params)
    jax.block_until_ready(res.op.xs)
    dt = time.perf_counter() - t0
    print(f"Solver completed in {dt:.3f} seconds "
          f"(converged={bool(res.converged)}, "
          f"iterations={int(res.cumulative_iterations)}, "
          f"max constraint violation={float(res.max_violation):.4f}).")
    print("Total costs:", np.asarray(res.total_costs))

    if args.check_nash:
        from ilqgames_tpu.utils.check_nash import numerical_check_local_nash

        is_nash = numerical_check_local_nash(
            problem.dynamics, problem.player_costs, problem.spec,
            res.strategy, res.op, problem.x0,
        )
        print("Solution is" + ("" if bool(is_nash) else " NOT")
              + " a numerical local Nash.")

    if args.save or args.viz or args.html:
        _, log = problem.solve_logged(params)
        if args.html:
            from ilqgames_tpu import viz_html

            out = viz_html.render_html(problem, log, args.html)
            print(f"Saved HTML animation to {out}")
        if args.save:
            path = log.save(args.experiment_name)
            print(f"Saved log to {path}")
        if args.viz:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            from ilqgames_tpu import viz

            viz.plot_top_down(problem, log)
            out = f"{args.experiment_name or args.example}.png"
            plt.savefig(out, dpi=120)
            print(f"Saved plot to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
