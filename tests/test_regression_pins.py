"""Self-regression pins: converged costs and iteration counts of several
example problems at fixed budgets, recorded from the current solver.
These guard future refactors (the fused machine, linesearch, kernels)
against silent behavioral drift — any change that moves these numbers is
either a bug or a deliberate semantics change that must update the pins."""

import numpy as np
import pytest

import ilqgames_tpu.examples as examples
from ilqgames_tpu.solver.params import SolverParams

PARAMS = SolverParams(
    max_solver_iters=25,
    unconstrained_solver_max_iters=10,
    max_backtracking_steps=20,
    initial_alpha_scaling=0.1,
    convergence_tolerance=1.0,
    expected_decrease_fraction=0.001,
)

# (example, num_time_steps, expected iterations, expected total costs)
PINS = [
    ("three_player_flat_intersection", 40, 2,
     [1742.0328, 0.0, 12.28315]),
    ("dubins_origin", 40, 2, [13243.708, 66214.68]),
    ("one_player_reachability", 40, 3, [4.1052866]),
    # Re-pinned 2026-08-17: the sparse analytic merit-gradient path
    # (costs/base.py gradient_pairs) shifts ulp-level rounding in the
    # linesearch merit, flipping one marginal Armijo accept for player 4
    # (cost 8848.295 -> 8919.63 at the same iteration count).
    ("roundabout_merging", 40, 5,
     [7632.1455, 8848.291, 6165.8145, 8919.63]),
]


@pytest.mark.parametrize("name,N,iters,costs", PINS,
                         ids=[p[0] for p in PINS])
def test_regression_pin(name, N, iters, costs):
    prob = examples.get(name)(num_time_steps=N)
    res = prob.solve(PARAMS)
    assert int(res.cumulative_iterations) == iters
    np.testing.assert_allclose(
        np.asarray(res.total_costs), np.asarray(costs, np.float32),
        rtol=1e-4, atol=1e-3,
    )
