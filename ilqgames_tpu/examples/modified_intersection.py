"""The Car5D intersection family: the 'modified' soft-cost intersection and
its reachability-based safety counterpart — the problem pair driven by the
minimally-invasive receding-horizon example.

Reference parity:
  - modified_three_player_intersection
    (src/modified_three_player_intersection_example.cpp): Car5D+Car5D+
    Unicycle4D, all-soft costs (lane center/boundaries, min/max/nominal
    speed semiquadratics, control quadratics), state/control
    regularization 10/10. Shipped quirk: kProximityCostWeight = 0.0, so
    the added proximity costs are no-ops.
  - three_player_intersection_reachability
    (src/three_player_intersection_reachability_example.cpp): same
    dynamics/initial state; P1's cost becomes max-over-time of the WORSE
    pairwise signed-distance margin (ExtremeValueCost over
    SignedDistanceCosts with nominal kMinProximity), tiny control costs;
    P2/P3 keep their driving costs (their proximity weights are 0 too).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ilqgames_tpu.costs import atoms
from ilqgames_tpu.costs.player_cost import PlayerCost, STRUCTURE_MAX
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.dynamics import models
from ilqgames_tpu.examples.three_player_intersection import lane_polylines
from ilqgames_tpu.problem import Problem

INTER_AXLE = 4.0
STATE_REG = 10.0
CONTROL_REG = 10.0
OMEGA_WEIGHT = 0.1
A_WEIGHT = 0.1
P1_CONTROL_WEIGHT = 0.1
LANE_WEIGHT = 25.0
LANE_BOUNDARY_WEIGHT = 100.0
MIN_PROXIMITY = 6.0
LANE_HALF_WIDTH = 2.5
MAX_V_WEIGHT = 100.0
NOMINAL_V_WEIGHT = 10.0
P1_MAX_V, P2_MAX_V, P3_MAX_V, MIN_V = 12.0, 12.0, 2.0, 1.0
P1_NOMINAL_V, P2_NOMINAL_V, P3_NOMINAL_V = 8.0, 6.0, 1.5

P1_INITIAL = dict(x=-2.0, y=-30.0, heading=np.pi / 2, speed=4.0)
P2_INITIAL = dict(x=-10.0, y=45.0, heading=-np.pi / 2, speed=3.0)
P3_INITIAL = dict(x=-11.0, y=16.0, heading=0.0, speed=1.25)


def _base(dt, num_time_steps):
    dyn = dyn_base.concatenate(
        "modified_three_player_intersection",
        [models.car_5d(INTER_AXLE), models.car_5d(INTER_AXLE),
         models.unicycle_4d()],
    )
    spec = dyn.spec(dt=dt, num_time_steps=num_time_steps)

    # car5d = [px py theta phi v], unicycle = [px py theta v].
    idx = dict(
        x1=0, y1=1, v1=4,
        x2=5, y2=6, v2=9,
        x3=10, y3=11, v3=13,
    )
    x0 = np.zeros(spec.xdim, np.float32)
    x0[[0, 1, 2, 4]] = [P1_INITIAL["x"], P1_INITIAL["y"],
                        P1_INITIAL["heading"], P1_INITIAL["speed"]]
    x0[[5, 6, 7, 9]] = [P2_INITIAL["x"], P2_INITIAL["y"],
                        P2_INITIAL["heading"], P2_INITIAL["speed"]]
    x0[[10, 11, 12, 13]] = [P3_INITIAL["x"], P3_INITIAL["y"],
                            P3_INITIAL["heading"], P3_INITIAL["speed"]]
    return dyn, spec, idx, x0


def _driving_costs(lane, xi, yi, vi, max_v, nominal_v):
    return (
        atoms.quadratic_polyline2(LANE_WEIGHT, lane, xi, yi, "LaneCenter"),
        atoms.semiquadratic_polyline2(
            LANE_BOUNDARY_WEIGHT, lane, xi, yi, LANE_HALF_WIDTH, True,
            "LaneRightBoundary",
        ),
        atoms.semiquadratic_polyline2(
            LANE_BOUNDARY_WEIGHT, lane, xi, yi, -LANE_HALF_WIDTH, False,
            "LaneLeftBoundary",
        ),
        atoms.semiquadratic(MAX_V_WEIGHT, vi, MIN_V, False, "MinV"),
        atoms.semiquadratic(MAX_V_WEIGHT, vi, max_v, True, "MaxV"),
        atoms.quadratic(NOMINAL_V_WEIGHT, vi, nominal_v, "NominalV"),
    )


def make_problem(dt=None, num_time_steps=None) -> Problem:
    """modified_three_player_intersection."""
    dyn, spec, i, x0 = _base(dt, num_time_steps)
    lane1, lane2, lane3 = lane_polylines()

    def player(lane, xi, yi, vi, max_v, nom_v, pidx, u2name):
        return PlayerCost(
            state_costs=_driving_costs(lane, xi, yi, vi, max_v, nom_v),
            control_costs=(
                (pidx, atoms.quadratic(OMEGA_WEIGHT, 0, 0.0, "Steering")),
                (pidx, atoms.quadratic(A_WEIGHT, 1, 0.0, u2name)),
            ),
            state_regularization=STATE_REG,
            control_regularization=CONTROL_REG,
        )

    return Problem(
        name="modified_three_player_intersection",
        dynamics=dyn,
        player_costs=(
            player(lane1, i["x1"], i["y1"], i["v1"], P1_MAX_V, P1_NOMINAL_V,
                   0, "Acceleration"),
            player(lane2, i["x2"], i["y2"], i["v2"], P2_MAX_V, P2_NOMINAL_V,
                   1, "Acceleration"),
            player(lane3, i["x3"], i["y3"], i["v3"], P3_MAX_V, P3_NOMINAL_V,
                   2, "Acceleration"),
        ),
        x0=jnp.asarray(x0),
        spec=spec,
    )


def make_reachability(dt=None, num_time_steps=None) -> Problem:
    """three_player_intersection_reachability: the safety counterpart."""
    dyn, spec, i, x0 = _base(dt, num_time_steps)
    dyn = dyn_base.concatenate(
        "three_player_intersection_reachability",
        [models.car_5d(INTER_AXLE), models.car_5d(INTER_AXLE),
         models.unicycle_4d()],
    )
    lane1, lane2, lane3 = lane_polylines()

    sd12 = atoms.signed_distance((i["x1"], i["y1"]), (i["x2"], i["y2"]),
                                 MIN_PROXIMITY, name="ProxCostP2")
    sd13 = atoms.signed_distance((i["x1"], i["y1"]), (i["x3"], i["y3"]),
                                 MIN_PROXIMITY, name="ProxCostP3")

    pc1 = PlayerCost(
        state_costs=(
            atoms.extreme_value((sd12, sd13), is_min=False,
                                name="RelativeDistance"),
        ),
        control_costs=(
            (0, atoms.quadratic(P1_CONTROL_WEIGHT, 0, 0.0, "Steering")),
            (0, atoms.quadratic(P1_CONTROL_WEIGHT, 1, 0.0, "Acceleration")),
        ),
        structure=STRUCTURE_MAX,
        state_regularization=STATE_REG,
        control_regularization=CONTROL_REG,
    )
    pc2 = PlayerCost(
        state_costs=_driving_costs(lane2, i["x2"], i["y2"], i["v2"],
                                   P2_MAX_V, P2_NOMINAL_V),
        control_costs=(
            (1, atoms.quadratic(OMEGA_WEIGHT, 0, 0.0, "Steering")),
            (1, atoms.quadratic(A_WEIGHT, 1, 0.0, "Acceleration")),
        ),
        state_regularization=STATE_REG,
        control_regularization=CONTROL_REG,
    )
    pc3 = PlayerCost(
        state_costs=_driving_costs(lane3, i["x3"], i["y3"], i["v3"],
                                   P3_MAX_V, P3_NOMINAL_V),
        control_costs=(
            (2, atoms.quadratic(OMEGA_WEIGHT, 0, 0.0, "Steering")),
            (2, atoms.quadratic(A_WEIGHT, 1, 0.0, "Acceleration")),
        ),
        state_regularization=STATE_REG,
        control_regularization=CONTROL_REG,
    )
    return Problem(
        name="three_player_intersection_reachability",
        dynamics=dyn,
        player_costs=(pc1, pc2, pc3),
        x0=jnp.asarray(x0),
        spec=spec,
    )
