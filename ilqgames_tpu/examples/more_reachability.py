"""Remaining pursuit-evasion / reachability examples.

Reference parity:
  - modified_air_3d (src/modified_air_3d_example.cpp): two 2D point
    masses; evader's quadratic-difference cost carries a NEGATIVE weight
    (-1e6, maximize separation), pursuer +1e6. P2 starts at the Air3D
    relative state (rx0, ry0) = (4, 3).
  - two_player_collision_avoidance_reachability
    (src/two_player_collision_avoidance_reachability_example.cpp): two 5D
    cars on crossing courses; both players share ONE max-over-time
    SignedDistanceCost whose nominal is the mid-horizon separation of the
    two straight-line extrapolations.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ilqgames_tpu.costs import atoms
from ilqgames_tpu.costs.player_cost import PlayerCost, STRUCTURE_MAX
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.dynamics import models
from ilqgames_tpu.problem import Problem


def make_modified_air_3d(dt=None, num_time_steps=None, rx0=4.0, ry0=3.0
                         ) -> Problem:
    dyn = dyn_base.concatenate(
        "modified_air_3d", [models.point_mass_2d(), models.point_mass_2d()]
    )
    spec = dyn.spec(dt=dt, num_time_steps=num_time_steps)

    x0 = np.zeros(spec.xdim, np.float32)
    x0[[4, 5]] = [rx0, ry0]  # P2 at the relative offset

    evader_w, pursuer_w = -1e6, 1e6
    pc1 = PlayerCost(
        state_costs=(
            atoms.quadratic_difference(evader_w, (0, 1), (4, 5), "Target"),
        ),
        control_costs=((0, atoms.quadratic(0.1, None, 0.0, "ControlCost")),),
        state_regularization=1.0,
    )
    pc2 = PlayerCost(
        state_costs=(
            atoms.quadratic_difference(pursuer_w, (0, 1), (4, 5), "Target"),
        ),
        control_costs=((1, atoms.quadratic(0.1, None, 0.0, "ControlCost")),),
        state_regularization=1.0,
    )
    return Problem(
        name="modified_air_3d", dynamics=dyn, player_costs=(pc1, pc2),
        x0=jnp.asarray(x0), spec=spec,
    )


def make_two_player_collision_avoidance(
    dt=None, num_time_steps=None, px0=0.0, py0=-5.0
) -> Problem:
    L = 4.0
    p1_heading, p1_speed = 0.1, 5.0
    p2 = dict(x=0.0, y=0.0, heading=0.0, speed=5.0)

    dyn = dyn_base.concatenate(
        "two_player_collision_avoidance_reachability",
        [models.car_5d(L), models.car_5d(L)],
    )
    spec = dyn.spec(dt=dt, num_time_steps=num_time_steps)
    horizon = spec.dt * spec.num_time_steps

    x0 = np.zeros(spec.xdim, np.float32)
    x0[[0, 1, 2, 4]] = [px0, py0, p1_heading, p1_speed]
    x0[[5, 6, 7, 9]] = [p2["x"], p2["y"], p2["heading"], p2["speed"]]

    # Nominal separation: straight-line extrapolations at mid-horizon
    # (…cpp ConstructPlayerCosts).
    t_mid = 0.5 * horizon
    p1_mid = np.array([px0, py0]) + t_mid * p1_speed * np.array(
        [np.cos(p1_heading), np.sin(p1_heading)]
    )
    p2_mid = np.array([p2["x"], p2["y"]]) + t_mid * p2["speed"] * np.array(
        [np.cos(p2["heading"]), np.sin(p2["heading"])]
    )
    nominal = float(np.linalg.norm(p1_mid - p2_mid))

    sd = atoms.signed_distance((0, 1), (5, 6), nominal,
                               name="CollisionAvoidance")
    pc1 = PlayerCost(
        state_costs=(sd,),
        control_costs=((0, atoms.quadratic(0.1, None, 0.0, "ControlCost")),),
        structure=STRUCTURE_MAX,
    )
    pc2 = PlayerCost(
        state_costs=(sd,),
        control_costs=((1, atoms.quadratic(0.1, None, 0.0, "ControlCost")),),
        structure=STRUCTURE_MAX,
    )
    return Problem(
        name="two_player_collision_avoidance_reachability",
        dynamics=dyn, player_costs=(pc1, pc2), x0=jnp.asarray(x0), spec=spec,
    )
