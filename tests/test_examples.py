"""End-to-end example solves (reference exercises these through its exec
binaries and Nash checks, SURVEY.md §4). Kept on shortened budgets so the
CPU suite stays fast; full-horizon convergence is exercised by bench.py
and the golden comparisons."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ilqgames_tpu.examples as examples
from ilqgames_tpu.solver.params import SolverParams

pytestmark = pytest.mark.slow  # full-solve / interpret-mode parity tier (~26 min total); fast gate: pytest -m "not slow"

# The shipped exec mains' parameters (exec/three_player_intersection/
# main.cpp:110-121), which differ substantially from SolverParams defaults.
EXEC_PARAMS = SolverParams(
    max_solver_iters=100,
    unconstrained_solver_max_iters=10,
    max_backtracking_steps=100,
    initial_alpha_scaling=0.1,
    convergence_tolerance=1.0,
    expected_decrease_fraction=0.001,
)


def test_flat_intersection_converges():
    prob = examples.get("three_player_flat_intersection")()
    res = prob.solve(EXEC_PARAMS)
    assert bool(res.converged)
    # All three agents keep moving roughly along their lanes.
    xs = np.asarray(res.op.xs)
    assert xs[-1, 1] > xs[0, 1] + 20.0  # P1 northbound
    assert xs[-1, 7] < xs[0, 7] - 20.0  # P2 southbound then east
    assert xs[-1, 12] > xs[0, 12] + 5.0  # P3 eastbound pedestrian


def test_intersection_progresses():
    # The nonlinear constrained problem: the unmodified reference itself
    # fails full constraint satisfaction at this budget (baselines/
    # measured.json), so assert solver progress rather than convergence.
    prob = examples.get("three_player_intersection")(num_time_steps=50)
    res = prob.solve(EXEC_PARAMS)
    xs = np.asarray(res.op.xs)
    assert np.isfinite(xs).all()
    assert xs[-1, 1] > xs[0, 1] + 10.0  # P1 makes progress north
    # Pairwise separations at every knot stay clear of outright collision.
    d12 = np.hypot(xs[:, 0] - xs[:, 6], xs[:, 1] - xs[:, 7])
    assert d12.min() > 1.0


def test_registry_rejects_unknown():
    with pytest.raises(KeyError):
        examples.get("not_a_real_example")
