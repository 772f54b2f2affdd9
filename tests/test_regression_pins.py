"""Self-regression pins: converged costs and iteration counts of several
example problems at fixed budgets, recorded from the current solver.
These guard future refactors (the fused machine, linesearch, kernels)
against silent behavioral drift — any change that moves these numbers is
either a bug or a deliberate semantics change that must update the pins."""

import numpy as np
import pytest

import ilqgames_tpu.examples as examples
from ilqgames_tpu.solver.params import SolverParams

pytestmark = pytest.mark.slow  # full-solve / interpret-mode parity tier (~26 min total); fast gate: pytest -m "not slow"

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
    # This example sits on a marginal Armijo accept for player 4: any
    # ulp-level rounding shift in the linesearch merit (e.g. from XLA
    # fusion decisions changing with innocuous trace edits) flips it
    # between two self-consistent outcomes at the same iteration count.
    # Both are pinned; drift to a THIRD outcome fails the test.
    ("roundabout_merging", 40, 5,
     ([7632.157, 8848.295, 6165.829, 8848.295],
      [7632.1455, 8848.291, 6165.8145, 8919.63])),
]


@pytest.mark.parametrize("name,N,iters,costs", PINS,
                         ids=[p[0] for p in PINS])
def test_regression_pin(name, N, iters, costs):
    prob = examples.get(name)(num_time_steps=N)
    res = prob.solve(PARAMS)
    assert int(res.cumulative_iterations) == iters
    alts = costs if isinstance(costs, tuple) else (costs,)
    got = np.asarray(res.total_costs)
    ok = any(
        np.allclose(got, np.asarray(c, np.float32), rtol=1e-4, atol=1e-3)
        for c in alts
    )
    assert ok, f"{name}: {got} matches none of the pinned outcomes {alts}"
