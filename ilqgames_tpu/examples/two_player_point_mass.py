"""Two-player 1D point-mass LQ game — BASELINE config 1 and the reference
prototype's canonical test problem (python/test_two_player_point_mass.py:36-94,
test/test_lq_solver.cpp:146-248): double-integrator state contested by two
players with asymmetric control authority and coupled quadratic costs. The
game is exactly LQ, so one iLQ iteration reaches the Nash equilibrium; the
LQ kernel's output is cross-validated against Lyapunov iterations in
tests/test_lq_solver.py."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ilqgames_tpu.costs import atoms
from ilqgames_tpu.costs.player_cost import PlayerCost
from ilqgames_tpu.dynamics.base import MultiPlayerDynamics
from ilqgames_tpu.problem import Problem

A_CONT = np.array([[0.0, 1.0], [0.0, 0.0]], np.float32)
B1 = np.array([0.05, 1.0], np.float32)
B2 = np.array([0.032, 0.11], np.float32)
COST_SCALE = 0.1


def make_problem(dt=None, num_time_steps=None, x0=(1.0, 0.0)) -> Problem:
    # Scalar-unrolled ode (no captured array constants): Pallas kernels
    # trace this function in-kernel and Mosaic cannot lower captured
    # jnp constants (see ops/pallas/sweep.py).
    b10, b11 = float(B1[0]), float(B1[1])
    b20, b21 = float(B2[0]), float(B2[1])

    def ode(t, x, us):
        return jnp.stack([
            x[1] + b10 * us[0, 0] + b20 * us[1, 0],
            b11 * us[0, 0] + b21 * us[1, 0],
        ])

    def ode_jac(t, x, us):
        # Sparse analytic Jacobians (dynamics/base.py entry format:
        # ((row, col), val) / ((row, player, col), val)) so the fused
        # Pallas stage kernel serves this problem too.
        jx = [((0, 1), 1.0)]
        ju = [((0, 0, 0), b10), ((0, 1, 0), b20),
              ((1, 0, 0), b11), ((1, 1, 0), b21)]
        return jx, ju

    dyn = MultiPlayerDynamics(
        name="two_player_point_mass", xdims=(2, 0), udims=(1, 1), ode=ode,
        ode_jac=ode_jac,
    )
    spec = dyn.spec(dt=dt, num_time_steps=num_time_steps)

    pc1 = PlayerCost(
        state_costs=(atoms.quadratic(1.0, None, 0.0, "State"),),
        control_costs=(
            (0, atoms.quadratic(1.0, None, 0.0, "OwnControl")),
            (1, atoms.quadratic(COST_SCALE, None, 0.0, "OtherControl")),
        ),
    )
    pc2 = PlayerCost(
        state_costs=(atoms.quadratic(COST_SCALE, None, 0.0, "State"),),
        control_costs=(
            (0, atoms.quadratic(COST_SCALE, None, 0.0, "OtherControl")),
            (1, atoms.quadratic(1.0, None, 0.0, "OwnControl")),
        ),
    )
    return Problem(
        name="two_player_point_mass", dynamics=dyn,
        player_costs=(pc1, pc2),
        x0=jnp.asarray(np.asarray(x0, np.float32)), spec=spec,
    )
