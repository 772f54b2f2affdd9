"""Open-loop solver end-to-end: the dubins_origin example is the
reference's open-loop-vs-feedback comparison problem
(exec/dubins_origin_example, src/dubins_origin_example.cpp:37-40).
Both solver modes must run to completion and produce different equilibria
(open-loop strategies have P == 0)."""

import numpy as np

import ilqgames_tpu.examples as examples
from ilqgames_tpu.solver.params import SolverParams


def params(open_loop):
    return SolverParams(
        max_solver_iters=15,
        max_backtracking_steps=20,
        initial_alpha_scaling=0.5,
        convergence_tolerance=0.1,
        expected_decrease_fraction=0.1,
        open_loop=open_loop,
    )


def test_open_loop_and_feedback_both_solve():
    prob = examples.get("dubins_origin")(num_time_steps=50)

    fb = prob.solve(params(open_loop=False))
    ol = prob.solve(params(open_loop=True))

    assert np.isfinite(np.asarray(fb.op.xs)).all()
    assert np.isfinite(np.asarray(ol.op.xs)).all()

    # Open-loop strategies are purely affine (P == 0); feedback gains not.
    assert np.abs(np.asarray(ol.strategy.Ps)).max() == 0.0
    assert np.abs(np.asarray(fb.strategy.Ps)).max() > 0.0

    # The two information structures reach different trajectories.
    assert np.abs(np.asarray(fb.op.xs) - np.asarray(ol.op.xs)).max() > 1e-3
