"""Parallel-in-time coupled-Riccati prototype (solver/lq_pint.py) vs the
sequential kernel (solver/lq_feedback.py).

With num_sweeps >= N-1 the Jacobi sweeps have fully propagated the
terminal condition, so the result must match the sequential recursion to
float tolerance on REAL flagship stage operands (linearize/quadraticize
of a mid-solve operating point). Fewer sweeps are approximations whose
accuracy tools/pint_crossover.py measures; the exactness-at-full-depth
property is what this test pins.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.solver.lq_feedback import solve_lq_feedback
from ilqgames_tpu.solver.lq_pint import solve_lq_feedback_pint


@pytest.fixture(scope="module")
def flagship_stage_operands():
    N = 20
    prob = make_problem(num_time_steps=N)
    spec = prob.spec
    # A realistic (non-trivial) operating point: roll out the initial
    # strategies from x0, then linearize/quadraticize about it.
    op0 = prob.initial_operating_point()
    op = dyn_base.rollout(
        prob.dynamics, spec, prob.x0,
        op0.replace(xs=op0.xs.at[0].set(prob.x0)),
        prob.initial_strategy())
    al = pcost.ALState.init(prob.player_costs, spec)
    _, ek = pcost.total_costs(prob.player_costs, spec, op)
    lin = dyn_base.linearize(prob.dynamics, spec, op)
    quad = pcost.quadraticize(prob.player_costs, spec, op, al, ek)
    x0 = jnp.zeros((spec.xdim,), jnp.float32)
    x0 = x0.at[0].set(0.1).at[7].set(-0.2)
    return spec, lin, quad, x0


def test_full_depth_matches_sequential(flagship_stage_operands):
    spec, lin, quad, x0 = flagship_stage_operands
    N = spec.num_time_steps
    seq = solve_lq_feedback(spec, lin, quad, x0)
    par = solve_lq_feedback_pint(spec, lin, quad, x0, num_sweeps=N - 1)
    np.testing.assert_allclose(
        np.asarray(par.strategy.Ps), np.asarray(seq.strategy.Ps),
        rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(par.strategy.alphas), np.asarray(seq.strategy.alphas),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(par.delta_xs), np.asarray(seq.delta_xs),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(par.costates), np.asarray(seq.costates),
        rtol=1e-3, atol=1e-3)


def test_sweeps_converge_monotonically(flagship_stage_operands):
    """Gain error vs the sequential solution must be non-increasing in
    sweep count and exact once sweeps cover the horizon."""
    spec, lin, quad, x0 = flagship_stage_operands
    N = spec.num_time_steps
    seq = solve_lq_feedback(spec, lin, quad, x0)
    ref = np.asarray(seq.strategy.Ps)
    errs = []
    for m in (1, N // 4, N // 2, N - 1):
        par = solve_lq_feedback_pint(spec, lin, quad, x0, num_sweeps=m)
        errs.append(
            float(np.max(np.abs(np.asarray(par.strategy.Ps) - ref))))
    assert errs[-1] < 1e-3
    # Tolerate float noise but demand a decisive downward trend.
    assert errs[-1] <= errs[0] * 0.5 + 1e-6
