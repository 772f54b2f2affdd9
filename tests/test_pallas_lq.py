"""Parity: Pallas feedback-LQ kernel vs the XLA scan path.

Runs in interpret mode on CPU (conftest forces the CPU backend). The
kernel's LU-with-partial-pivoting differs from `jnp.linalg.solve` only in
op order, so parity is tolerance-level, not bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_pallas
from ilqgames_tpu.solver.lq_feedback import solve_lq_feedback
from ilqgames_tpu.types import OperatingPoint, Strategy


@pytest.fixture(scope="module")
def lq_inputs():
    problem = make_problem(num_time_steps=11)
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec
    B = 4
    rng = np.random.RandomState(0)
    x0b = jnp.asarray(
        np.tile(np.asarray(problem.x0)[None], (B, 1))
        + 0.1 * rng.randn(B, spec.xdim).astype(np.float32)
    )
    al0 = pcost.ALState.init(costs, spec)
    warm_op = OperatingPoint.zeros(spec)
    warm_strategy = Strategy.zeros(spec)

    def init_one(x0):
        last_op = warm_op.replace(xs=warm_op.xs.at[0].set(x0))
        op = dyn_base.rollout(dyn, spec, x0, last_op, warm_strategy)
        _, ek = pcost.total_costs(costs, spec, op)
        quad = pcost.quadraticize(costs, spec, op, al0, ek)
        lin = dyn_base.linearize(dyn, spec, op)
        return lin, quad, x0 - op.xs[0]

    lin, quad, dx0 = jax.vmap(init_one)(x0b)
    return spec, lin, quad, dx0


def test_lq_feedback_parity(lq_inputs):
    spec, lin, quad, dx0 = lq_inputs

    ref = jax.vmap(lambda l, q, d: solve_lq_feedback(spec, l, q, d))(
        lin, quad, dx0
    )
    got = solve_lq_feedback_pallas(
        spec, lin, quad, dx0, batch_block=4, interpret=True
    )

    np.testing.assert_allclose(
        got.strategy.Ps, ref.strategy.Ps, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        got.strategy.alphas, ref.strategy.alphas, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        got.delta_xs, ref.delta_xs, rtol=5e-4, atol=5e-4
    )


def test_lq_feedback_batch_padding(lq_inputs):
    """Batch not a multiple of batch_block: padded lanes must not leak."""
    spec, lin, quad, dx0 = lq_inputs
    got4 = solve_lq_feedback_pallas(
        spec, lin, quad, dx0, batch_block=4, interpret=True
    )
    trim = jax.tree_util.tree_map(lambda a: a[:3], (lin, quad, dx0))
    lin3, quad3, dx03 = trim
    got3 = solve_lq_feedback_pallas(
        spec, lin3, quad3, dx03, batch_block=4, interpret=True
    )
    np.testing.assert_allclose(
        got3.strategy.alphas, got4.strategy.alphas[:3], rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        got3.delta_xs, got4.delta_xs[:3], rtol=1e-6, atol=1e-6
    )
