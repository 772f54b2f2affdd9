"""Four-car roundabout merging (src/roundabout_merging_example.cpp:75-455).

Shipped quirks preserved: every player's acceleration cost acts on P1's
acceleration state index (:317-327 all use kP1AIdx), and proximity costs
are only added against ring neighbors (p1:{p2,p4}, p2:{p1,p3}, p3:{p2,p4},
p4:{p1,p3}); InitializeAlongRoute is commented out upstream so the initial
operating point is zeros."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ilqgames_tpu.costs import atoms
from ilqgames_tpu.costs.player_cost import PlayerCost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.dynamics import models
from ilqgames_tpu.examples.routes import roundabout_lane_center
from ilqgames_tpu.problem import Problem

OMEGA_WEIGHT = 500.0
A_WEIGHT = 50.0
JERK_WEIGHT = 5.0
MAX_V_WEIGHT = 1000.0
NOMINAL_V_WEIGHT = 10.0
LANE_WEIGHT = 25.0
LANE_BOUNDARY_WEIGHT = 100.0
MIN_PROXIMITY = 6.0
PROX_WEIGHT = 100.0
LANE_HALF_WIDTH = 2.5
MAX_V, MIN_V, NOMINAL_V = 12.0, 1.0, 10.0
INTER_AXLE = 4.0

DISTANCES = (25.0, 10.0, 25.0, 10.0)
SPEEDS = (3.0, 2.0, 3.0, 2.0)


def make_problem(dt=None, num_time_steps=None) -> Problem:
    dyn = dyn_base.concatenate(
        "roundabout_merging", [models.car_6d(INTER_AXLE)] * 4
    )
    spec = dyn.spec(dt=dt, num_time_steps=num_time_steps)

    angle_offset = np.pi / 4
    wedge = np.pi
    angles = [angle_offset + i * np.pi / 2 for i in range(4)]
    lanes = [
        roundabout_lane_center(angles[i], angles[i] + wedge, DISTANCES[i])
        for i in range(4)
    ]

    xi = [(6 * i, 6 * i + 1, 6 * i + 2, 6 * i + 4, 6 * i + 5) for i in range(4)]

    x0 = np.zeros(spec.xdim, np.float32)
    for i, (px, py, hi, vi, ai) in enumerate(xi):
        first, second = lanes[i][0], lanes[i][1]
        heading = np.arctan2(second[1] - first[1], second[0] - first[0])
        x0[[px, py, hi, vi]] = [first[0], first[1], heading, SPEEDS[i]]

    # Ring-neighbor proximity pairs (shipped adds only these).
    prox_pairs = {0: (1, 3), 1: (0, 2), 2: (1, 3), 3: (0, 2)}
    p1_a_idx = xi[0][4]  # every a-cost targets P1's accel (shipped bug)

    pcs = []
    for i, (px, py, hi, vi, ai) in enumerate(xi):
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
            atoms.semiquadratic(MAX_V_WEIGHT, vi, MIN_V, False, "MinV"),
            atoms.semiquadratic(MAX_V_WEIGHT, vi, MAX_V, True, "MaxV"),
            atoms.quadratic(NOMINAL_V_WEIGHT, vi, NOMINAL_V, "NominalV"),
            atoms.quadratic(A_WEIGHT, p1_a_idx, 0.0, "Acceleration"),
        ]
        for j in prox_pairs[i]:
            ox, oy = xi[j][0], xi[j][1]
            state_costs.append(
                atoms.proximity(PROX_WEIGHT, (px, py), (ox, oy),
                                MIN_PROXIMITY, f"ProximityP{j + 1}")
            )
        pcs.append(
            PlayerCost(
                state_costs=tuple(state_costs),
                control_costs=(
                    (i, atoms.quadratic(OMEGA_WEIGHT, 0, 0.0, "Steering")),
                    (i, atoms.quadratic(JERK_WEIGHT, 1, 0.0, "Jerk")),
                ),
            )
        )

    return Problem(
        name="roundabout_merging", dynamics=dyn, player_costs=tuple(pcs),
        x0=jnp.asarray(x0), spec=spec,
    )
