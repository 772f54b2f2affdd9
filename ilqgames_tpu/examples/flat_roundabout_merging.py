"""Four-car FLAT roundabout merging (src/flat_roundabout_merging_example.cpp):
flat 6D cars in xi coordinates; RouteProgress costs replace nominal-speed
quadratics, one aux-input quadratic per car, ring-neighbor proximity, and
— unlike the nonlinear variant — InitializeAlongRoute IS active, so the
initial operating point tracks each lane at the initial speed."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ilqgames_tpu.costs import atoms
from ilqgames_tpu.costs.player_cost import PlayerCost
from ilqgames_tpu.dynamics import flat
from ilqgames_tpu.examples.routes import (
    initialize_along_route, roundabout_lane_center,
)
from ilqgames_tpu.problem import Problem

AUX_WEIGHT = 4.0
NOMINAL_V_WEIGHT = 10.0
LANE_WEIGHT = 25.0
LANE_BOUNDARY_WEIGHT = 100.0
MIN_PROXIMITY = 6.0
PROX_WEIGHT = 100.0
LANE_HALF_WIDTH = 2.5
NOMINAL_V = 10.0
INTER_AXLE = 4.0

DISTANCES = (25.0, 10.0, 25.0, 10.0)
SPEEDS = (3.0, 2.0, 3.0, 2.0)


def make_problem(dt=None, num_time_steps=None) -> Problem:
    dyn = flat.concatenate_flat(
        "flat_roundabout_merging", [flat.flat_car_6d(INTER_AXLE)] * 4
    )
    spec = dyn.spec(dt=dt, num_time_steps=num_time_steps)

    angle_offset = np.pi / 4
    wedge = np.pi
    angles = [angle_offset + i * np.pi / 2 for i in range(4)]
    lanes = [
        roundabout_lane_center(angles[i], angles[i] + wedge, DISTANCES[i])
        for i in range(4)
    ]

    # xi layout per flat car: [px py vx vy ax ay].
    pos = [(6 * i, 6 * i + 1) for i in range(4)]

    x0_real = np.zeros(spec.xdim, np.float32)
    for i in range(4):
        first, second = lanes[i][0], lanes[i][1]
        heading = np.arctan2(second[1] - first[1], second[0] - first[0])
        o = 6 * i
        x0_real[[o, o + 1, o + 2, o + 4]] = [
            first[0], first[1], heading, SPEEDS[i],
        ]
    x0 = dyn.to_linear_state(jnp.asarray(x0_real))

    prox_pairs = {0: (1, 3), 1: (0, 2), 2: (1, 3), 3: (0, 2)}

    pcs = []
    for i, (px, py) in enumerate(pos):
        state_costs = [
            atoms.quadratic_polyline2(LANE_WEIGHT, lanes[i], px, py,
                                      "LaneCenter"),
            atoms.semiquadratic_polyline2(
                LANE_BOUNDARY_WEIGHT, lanes[i], px, py, LANE_HALF_WIDTH,
                True, "LaneRightBoundary",
            ),
            atoms.semiquadratic_polyline2(
                LANE_BOUNDARY_WEIGHT, lanes[i], px, py, -LANE_HALF_WIDTH,
                False, "LaneLeftBoundary",
            ),
            atoms.route_progress(NOMINAL_V_WEIGHT, lanes[i], px, py,
                                 NOMINAL_V, name="RouteProgress"),
        ]
        for j in prox_pairs[i]:
            state_costs.append(
                atoms.proximity(PROX_WEIGHT, (px, py), pos[j],
                                MIN_PROXIMITY, f"ProximityP{j + 1}")
            )
        pcs.append(
            PlayerCost(
                state_costs=tuple(state_costs),
                control_costs=(
                    (i, atoms.quadratic(AUX_WEIGHT, None, 0.0, "Aux")),
                ),
            )
        )

    def op_initializer(spec_, op):
        for i, (px, py) in enumerate(pos):
            op = initialize_along_route(spec_, op, lanes[i], 0.0, SPEEDS[i],
                                        (px, py))
        return op

    return Problem(
        name="flat_roundabout_merging", dynamics=dyn,
        player_costs=tuple(pcs), x0=x0, spec=spec,
        op_initializer=op_initializer,
    )
