"""PlayerCost aggregation (mirrors test_player_cost.cpp:84-121): evaluation
sums state and control atoms; quadraticization accumulates into the right
blocks; regularization adds the documented diagonal; extreme-value costs
pick the active atom (test_extreme_value_test.cpp)."""

import numpy as np
import jax.numpy as jnp

from ilqgames_tpu.costs import atoms
from ilqgames_tpu.costs.player_cost import (
    ALState, PlayerCost, STRUCTURE_MAX, quadraticize, total_costs,
)
from ilqgames_tpu.types import GameSpec, OperatingPoint


def make_spec(N=4):
    return GameSpec(xdims=(3, 0), udims=(2, 1), num_time_steps=N)


def test_evaluate_accumulates():
    spec = make_spec()
    pc = PlayerCost(
        state_costs=(
            atoms.quadratic(2.0, 0, 1.0),
            atoms.quadratic(4.0, 1, 0.0),
        ),
        control_costs=(
            (0, atoms.quadratic(1.0, None, 0.0)),
            (1, atoms.quadratic(3.0, 0, 0.5)),
        ),
    )
    x = jnp.array([2.0, 3.0, 0.0])
    us = jnp.array([[1.0, 2.0], [1.5, 0.0]])
    expected = (
        0.5 * 2.0 * 1.0**2 + 0.5 * 4.0 * 9.0  # state
        + 0.5 * 1.0 * (1 + 4)                  # own control, all dims
        + 0.5 * 3.0 * 1.0**2                   # other player's control dim 0
    )
    np.testing.assert_allclose(float(pc.evaluate_stage(0.0, x, us)), expected,
                               rtol=1e-6)


def test_quadraticize_blocks_and_regularization():
    spec = make_spec()
    pc1 = PlayerCost(
        state_costs=(atoms.quadratic(2.0, 0, 0.0),),
        control_costs=((0, atoms.quadratic(1.0, None, 0.0)),
                       (1, atoms.quadratic(3.0, 0, 0.0))),
        state_regularization=0.5,
        control_regularization=0.25,
    )
    pc2 = PlayerCost(control_costs=((1, atoms.quadratic(1.0, 0, 0.0)),))
    op = OperatingPoint(
        xs=jnp.ones((spec.num_time_steps, 3)),
        us=jnp.ones((spec.num_time_steps, 2, 2)),
        t0=jnp.float32(0.0),
    )
    al = ALState.init((pc1, pc2), spec)
    quad = quadraticize((pc1, pc2), spec, op, al,
                        jnp.zeros((2,), jnp.int32))

    # P1 state Hessian: 2.0 in (0,0) + 0.5*I regularization.
    np.testing.assert_allclose(
        np.asarray(quad.Q[0, 0]),
        np.diag([2.5, 0.5, 0.5]), atol=1e-6,
    )
    # P1 own-control block: identity cost + 0.25*masked-diag reg.
    np.testing.assert_allclose(
        np.asarray(quad.R[0, 0, 0]), np.diag([1.25, 1.25]), atol=1e-6
    )
    # P1 on P2's control (1 real dim): 3.0 on dim 0, reg on dim 0 only.
    np.testing.assert_allclose(
        np.asarray(quad.R[0, 0, 1]), np.diag([3.25, 0.0]), atol=1e-6
    )
    # P2 has no state costs: zero state Hessian (no reg configured).
    assert np.abs(np.asarray(quad.Q[0, 1])).max() == 0.0


def test_extreme_value_selects_active():
    c1 = atoms.quadratic(1.0, 0, 0.0)   # 0.5*x0^2
    c2 = atoms.quadratic(1.0, 1, 0.0)   # 0.5*x1^2
    ev_max = atoms.extreme_value((c1, c2), is_min=False)
    ev_min = atoms.extreme_value((c1, c2), is_min=True)
    v = jnp.array([1.0, 3.0, 0.0])
    np.testing.assert_allclose(float(ev_max.evaluate(0.0, v)), 4.5)
    np.testing.assert_allclose(float(ev_min.evaluate(0.0, v)), 0.5)
    hess, grad = ev_max.quadraticize(0.0, v)
    # Active cost is c2: gradient lives in dim 1 only.
    np.testing.assert_allclose(np.asarray(grad), [0.0, 3.0, 0.0], atol=1e-6)


def test_max_over_time_structure():
    spec = make_spec(N=5)
    pc = PlayerCost(
        state_costs=(atoms.quadratic(1.0, 0, 0.0),),
        structure=STRUCTURE_MAX,
    )
    xs = jnp.zeros((5, 3)).at[:, 0].set(jnp.array([1.0, 3.0, 2.0, 3.0, 0.0]))
    op = OperatingPoint(xs=xs, us=jnp.zeros((5, 2, 2)), t0=jnp.float32(0.0))
    totals, ks = total_costs((pc,), spec, op)
    np.testing.assert_allclose(float(totals[0]), 4.5)
    assert int(ks[0]) == 1  # first occurrence of the max

    al = ALState.init((pc,), spec)
    quad = quadraticize((pc,), spec, op, al, ks)
    # State terms only at the extreme time.
    nz = np.abs(np.asarray(quad.l[:, 0])).sum(axis=-1) > 0
    assert list(nz) == [False, True, False, False, False]
