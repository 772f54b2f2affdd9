"""The fused flat AL+iLQ machine must be bitwise-identical to the nested
al.solve on the same instances (it is the production batched path)."""

import jax
import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.solver import al, fused
from ilqgames_tpu.solver.params import SolverParams
import pytest

pytestmark = pytest.mark.slow  # full-solve / interpret-mode parity tier (~26 min total); fast gate: pytest -m "not slow"

PARAMS = SolverParams(
    max_solver_iters=40,
    unconstrained_solver_max_iters=10,
    max_backtracking_steps=20,
    initial_alpha_scaling=0.1,
    convergence_tolerance=1.0,
    expected_decrease_fraction=0.001,
)


def test_fused_matches_nested_al():
    prob = make_problem(num_time_steps=30)
    rng = np.random.RandomState(0)
    x0s = jnp.asarray(
        np.tile(np.asarray(prob.x0)[None], (3, 1))
        + 0.1 * rng.randn(3, prob.spec.xdim).astype(np.float32)
    )

    run_al = jax.jit(jax.vmap(lambda x: al.solve(
        prob.dynamics, prob.player_costs, prob.spec, PARAMS, x,
        prob.initial_operating_point(), prob.initial_strategy(),
        prob.initial_al_state(),
    )))
    run_fused = jax.jit(jax.vmap(lambda x: fused.solve(
        prob.dynamics, prob.player_costs, prob.spec, PARAMS, x,
        prob.initial_operating_point(), prob.initial_strategy(),
        prob.initial_al_state(),
    )))

    ra, rf = run_al(x0s), run_fused(x0s)
    np.testing.assert_array_equal(
        np.asarray(ra.cumulative_iterations),
        np.asarray(rf.cumulative_iterations),
    )
    np.testing.assert_array_equal(np.asarray(ra.op.xs), np.asarray(rf.op.xs))
    np.testing.assert_array_equal(
        np.asarray(ra.max_violation), np.asarray(rf.max_violation)
    )

    # The host-stepped batched driver (the bench path) matches too.
    host = fused.make_host_batched_solver(
        prob.dynamics, prob.player_costs, prob.spec, PARAMS,
        warm_op=prob.initial_operating_point(),
        warm_strategy=prob.initial_strategy(),
        trips_per_call=7,
    )
    rh = host(x0s)
    np.testing.assert_array_equal(np.asarray(ra.op.xs), np.asarray(rh.op.xs))
