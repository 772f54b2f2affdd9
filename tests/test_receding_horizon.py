"""Receding-horizon runtime: warm-start shift invariants and splicer
semantics (reference src/problem.cpp:64-186, src/solution_splicer.cpp)."""

import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.examples.three_player_flat_intersection import make_problem
from ilqgames_tpu.runtime import receding_horizon as rh
from ilqgames_tpu.solver.params import SolverParams
from ilqgames_tpu.types import OperatingPoint, Strategy
import pytest

pytestmark = pytest.mark.slow  # full-solve / interpret-mode parity tier (~26 min total); fast gate: pytest -m "not slow"

PARAMS = SolverParams(
    max_solver_iters=20,
    unconstrained_solver_max_iters=10,
    max_backtracking_steps=20,
    initial_alpha_scaling=0.1,
    convergence_tolerance=1.0,
    expected_decrease_fraction=0.001,
)


def test_setup_next_receding_horizon_invariants():
    prob = make_problem()
    spec = prob.spec
    first = prob.solve(PARAMS)

    t0 = jnp.float32(0.25)
    planner_time = 0.25
    x = first.op.xs[3] + 0.01  # near the plan, slightly off

    new_op, new_strategy, new_x0 = rh.setup_next_receding_horizon(
        prob.dynamics, spec, first.op, first.strategy, x, t0, planner_time
    )
    # Reference invariant: |t0 + planner_time - new_t0| <= dt
    # (src/problem.cpp:124).
    assert abs(float(new_op.t0) - (float(t0) + planner_time)) <= spec.dt + 1e-5
    # The shifted plan's head must be SOME row of the old plan (the shift
    # index comes from the nearest-ego-position search, not from t0).
    us_old = np.asarray(first.op.us)
    diffs = np.abs(us_old - np.asarray(new_op.us[0])).reshape(
        us_old.shape[0], -1
    ).max(axis=1)
    shift = int(diffs.argmin())
    assert diffs[shift] < 1e-5
    # And the rest of the head must follow the old plan from there.
    np.testing.assert_allclose(
        np.asarray(new_op.us[1]), us_old[shift + 1], atol=1e-5
    )
    assert np.isfinite(np.asarray(new_op.xs)).all()


def test_splicer_keeps_past_and_overwrites_future():
    prob = make_problem()
    spec = prob.spec
    first = prob.solve(PARAMS)
    splicer = rh.Splicer.create(spec, first.op, first.strategy)

    # A fake "new solution" starting 3 steps into the old plan.
    shift = 3
    new_op = OperatingPoint(
        xs=jnp.roll(first.op.xs, -shift, axis=0) + 1.0,
        us=jnp.roll(first.op.us, -shift, axis=0),
        t0=first.op.t0 + shift * spec.dt,
    )
    new_strategy = Strategy(
        Ps=first.strategy.Ps, alphas=first.strategy.alphas
    )
    spliced = rh.splice(spec, splicer, new_op, new_strategy)

    # Past steps preserved from the old plan.
    np.testing.assert_allclose(
        np.asarray(spliced.op.xs[:shift]), np.asarray(first.op.xs[:shift]),
        atol=1e-6,
    )
    # Future overwritten with the new solution.
    np.testing.assert_allclose(
        np.asarray(spliced.op.xs[shift]), np.asarray(new_op.xs[0]), atol=1e-6
    )
    assert int(spliced.length) == shift + spec.num_time_steps


def test_simulator_advances_and_replans():
    prob = make_problem()
    xs, ts, state = rh.simulate(
        prob, PARAMS, final_time=1.5, replan_interval=0.25, planner_time=0.25
    )
    assert xs.shape[0] == 6
    assert np.isfinite(np.asarray(xs)).all()
    # P1 makes forward progress along its lane.
    assert float(xs[-1, 1]) > float(xs[0, 1])
    assert int(state.num_replans) == 5
