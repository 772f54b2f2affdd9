"""Sharded batched solving on a virtual 8-device CPU mesh: results must be
identical (up to float determinism) to per-instance solves, and leaves must
actually be partitioned across devices."""

import jax
import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.parallel import mesh as pmesh
from ilqgames_tpu.solver.params import SolverParams

PARAMS = SolverParams(
    max_solver_iters=6,
    unconstrained_solver_max_iters=2,
    max_backtracking_steps=10,
    initial_alpha_scaling=0.1,
    convergence_tolerance=1.0,
    expected_decrease_fraction=0.001,
)


def test_batched_solve_matches_single():
    assert jax.device_count() == 8, "conftest should force 8 CPU devices"
    problem = make_problem(num_time_steps=10)

    batch = 8
    rng = np.random.RandomState(0)
    x0 = np.tile(np.asarray(problem.x0)[None], (batch, 1))
    x0 += 0.05 * rng.randn(*x0.shape).astype(np.float32)
    x0 = jnp.asarray(x0)

    mesh = pmesh.make_mesh()
    solver = pmesh.make_batched_solver(problem, PARAMS, mesh)
    batched = solver(x0)

    # Output really is sharded over the mesh.
    assert len(batched.op.xs.sharding.device_set) == 8

    # Instance 3 must match a single unbatched solve bit-for-bit-ish.
    single = problem.solve(PARAMS, x0=x0[3])
    np.testing.assert_allclose(
        np.asarray(batched.op.xs[3]), np.asarray(single.op.xs),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(batched.total_costs[3]), np.asarray(single.total_costs),
        rtol=1e-4, atol=1e-4,
    )
