"""Sharded batched solving on a virtual 8-device CPU mesh: results must be
identical (up to float determinism) to per-instance solves, and leaves must
actually be partitioned across devices."""

import jax
import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.parallel import mesh as pmesh
from ilqgames_tpu.solver.params import SolverParams
import pytest

pytestmark = pytest.mark.slow  # full-solve / interpret-mode parity tier (~26 min total); fast gate: pytest -m "not slow"

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


def test_checkpoint_resume_on_different_mesh(tmp_path):
    """Elasticity: a checkpoint taken against a 2-device mesh resumes on
    a 4-device mesh and continues to the SAME result as a run that never
    changed topology (instances are pure data parallel, so a topology
    change is data movement only — utils/checkpoint.reshard)."""
    from jax.sharding import Mesh

    from ilqgames_tpu.solver import batched as bsolver
    from ilqgames_tpu.utils import checkpoint

    problem = make_problem(num_time_steps=10)
    dyn, costs, spec = (problem.dynamics, problem.player_costs,
                        problem.spec)
    batch = 8
    rng = np.random.RandomState(1)
    x0 = np.tile(np.asarray(problem.x0)[None], (batch, 1))
    x0 += 0.05 * rng.randn(*x0.shape).astype(np.float32)
    x0 = jnp.asarray(x0)

    mesh2 = Mesh(np.asarray(jax.devices()[:2]), (pmesh.BATCH_AXIS,))
    mesh4 = Mesh(np.asarray(jax.devices()[:4]), (pmesh.BATCH_AXIS,))

    # Leg 1 on the 2-device mesh: a short cold solve whose result is the
    # warm state; checkpoint (x0 + warm state + multipliers) to disk.
    leg1_params = PARAMS
    run2 = bsolver.make_host_batched_solver(
        dyn, costs, spec, leg1_params, trips_per_call=5, batch_block=1,
        interpret=True, mesh=mesh2)
    res1 = run2(x0)
    state = dict(op=res1.op, strategy=res1.strategy, al=res1.al_state)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, state)

    # Leg 2a (control): continue warm on the ORIGINAL topology.
    warm2 = bsolver.make_host_batched_warm_solver(
        dyn, costs, spec, PARAMS, trips_per_call=5, batch_block=1,
        interpret=True, mesh=mesh2)
    ref = warm2(x0, res1.op, res1.strategy, res1.al_state)

    # Leg 2b: resume the CHECKPOINT on the 4-device mesh.
    restored = checkpoint.resume_on_mesh(path, state, mesh4)
    assert len(restored["op"].xs.sharding.device_set) == 4
    warm4 = bsolver.make_host_batched_warm_solver(
        dyn, costs, spec, PARAMS, trips_per_call=5, batch_block=1,
        interpret=True, mesh=mesh4)
    res = warm4(jnp.asarray(checkpoint.reshard(x0, mesh4)),
                restored["op"], restored["strategy"], restored["al"])

    np.testing.assert_array_equal(
        np.asarray(res.converged), np.asarray(ref.converged))
    np.testing.assert_allclose(np.asarray(res.op.xs),
                               np.asarray(ref.op.xs),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.total_costs),
                               np.asarray(ref.total_costs),
                               rtol=1e-6, atol=1e-6)


def test_reshard_rejects_unbatched_leaves():
    """reshard validates every leaf carries the batch axis up front
    (advisor r4: a scalar/unbatched aux leaf previously sharded the
    wrong axis or died in an opaque device_put error)."""
    import pytest
    from jax.sharding import Mesh

    from ilqgames_tpu.utils import checkpoint

    mesh2 = Mesh(np.asarray(jax.devices()[:2]), (pmesh.BATCH_AXIS,))
    good = {"a": jnp.zeros((4, 3)), "b": jnp.ones((4,))}
    out = checkpoint.reshard(good, mesh2)
    assert len(out["a"].sharding.device_set) == 2

    with pytest.raises(ValueError, match="batch axis"):
        checkpoint.reshard({"a": jnp.zeros((4, 3)),
                            "mu": jnp.float32(10.0)}, mesh2)
    with pytest.raises(ValueError, match="batch axis"):
        checkpoint.reshard({"a": jnp.zeros((4, 3)),
                            "aux": jnp.zeros((3, 4))}, mesh2)
