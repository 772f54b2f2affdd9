"""Air3D pursuit-evasion in relative coordinates (classic HJ benchmark).

Reference parity with src/air_3d_example.cpp:70-141: evader max-over-time,
pursuer min-over-time on the signed distance to a radius-5 circle, omega
box constraints (including the reference's P2-max-on-Omega1Idx quirk at
:115-117, which constrains u2[0] either way since both players have one
control dim), and the ctor-quirk nominal values (p1 0.0, p2 1.0 — see
examples/reachability.py docstring)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ilqgames_tpu import geometry
from ilqgames_tpu.costs import atoms, constraints
from ilqgames_tpu.costs.player_cost import (
    PlayerCost, STRUCTURE_MAX, STRUCTURE_MIN,
)
from ilqgames_tpu.dynamics import models
from ilqgames_tpu.problem import Problem

OMEGA_COST_WEIGHT = 0.1
OMEGA_MAX = 1.0


def make_problem(dt=None, num_time_steps=None, rx0=4.0, ry0=3.0,
                 rtheta0=np.pi / 4, ve=1.0, vp=1.0) -> Problem:
    dyn = models.air_3d(ve, vp)
    spec = dyn.spec(dt=dt, num_time_steps=num_time_steps)

    x0 = np.zeros(spec.xdim, np.float32)
    x0[:3] = [rx0, ry0, rtheta0]

    circle = geometry.draw_circle(jnp.zeros(2), 5.0, 10)
    pc1 = PlayerCost(
        state_costs=(
            atoms.polyline2_signed_distance(circle, 0, 1, nominal=0.0,
                                            name="Target"),
        ),
        control_costs=(
            (0, atoms.quadratic(OMEGA_COST_WEIGHT, None, 0.0, "ControlCost")),
        ),
        control_constraints=(
            (0, constraints.single_dimension(0, OMEGA_MAX, True, "OmegaMax")),
            (0, constraints.single_dimension(0, -OMEGA_MAX, False, "OmegaMin")),
        ),
        structure=STRUCTURE_MAX,
    )
    pc2 = PlayerCost(
        state_costs=(
            atoms.polyline2_signed_distance(circle, 0, 1, nominal=1.0,
                                            name="Target"),
        ),
        control_costs=(
            (1, atoms.quadratic(OMEGA_COST_WEIGHT, None, 0.0, "ControlCost")),
        ),
        control_constraints=(
            (1, constraints.single_dimension(0, OMEGA_MAX, True, "OmegaMax")),
            (1, constraints.single_dimension(0, -OMEGA_MAX, False, "OmegaMin")),
        ),
        structure=STRUCTURE_MIN,
    )
    return Problem(
        name="air_3d", dynamics=dyn, player_costs=(pc1, pc2),
        x0=jnp.asarray(x0), spec=spec,
    )
