"""Approximate HJ-reachability examples: signed-distance target costs with
MAX/MIN-over-time structure and hard input constraints.

Reference parity:
  - one_player_reachability (src/one_player_reachability_example.cpp):
    Dubins car steering to a circular target. NOTE: the reference ctor
    call passes kAvoid where the float `nominal` parameter sits and the
    name string where `oriented_same_as_polyline` sits, so the cost that
    actually ships is signed_distance - 1.0 with default orientation; we
    replicate the SHIPPED behavior.
  - two_player_reachability (src/two_player_reachability_example.cpp):
    unicycle vs velocity disturbance; P1 max-over-time (avoid), P2
    min-over-time (reach); same ctor quirk (p1 nominal 0.0, p2 1.0).
  - three_player_collision_avoidance_reachability
    (src/three_player_collision_avoidance_reachability_example.cpp):
    three 5D cars on a collision course; pairwise signed-distance costs
    combined with max-structure ExtremeValueCost; omega/accel box
    constraints. This is BASELINE config 5's problem (1k-instance batch).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ilqgames_tpu import geometry
from ilqgames_tpu.costs import atoms, constraints
from ilqgames_tpu.costs.player_cost import (
    PlayerCost, STRUCTURE_MAX, STRUCTURE_MIN,
)
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.dynamics import models
from ilqgames_tpu.problem import Problem


def make_one_player(dt=None, num_time_steps=None, px0=-5.0, py0=-5.0,
                    theta0=np.pi / 4) -> Problem:
    """One-player reachability: Dubins car, circular target of radius 2."""
    speed = 1.0
    omega_max = 1.0
    dyn = dyn_base.concatenate(
        "one_player_reachability", [models.dubins_car(speed)]
    )
    spec = dyn.spec(dt=dt, num_time_steps=num_time_steps)

    x0 = np.zeros(spec.xdim, np.float32)
    x0[:3] = [px0, py0, theta0]

    circle = geometry.draw_circle(jnp.zeros(2), 2.0, 10)
    pc1 = PlayerCost(
        state_costs=(
            # Shipped ctor-quirk values: nominal=1.0, orientation default.
            atoms.polyline2_signed_distance(circle, 0, 1, nominal=1.0,
                                            name="Target"),
        ),
        control_costs=((0, atoms.quadratic(0.1, None, 0.0, "ControlCost")),),
        control_constraints=(
            (0, constraints.single_dimension(0, omega_max, True, "OmegaMax")),
            (0, constraints.single_dimension(0, -omega_max, False, "OmegaMin")),
        ),
        structure=STRUCTURE_MAX,
    )
    return Problem(
        name="one_player_reachability",
        dynamics=dyn, player_costs=(pc1,), x0=jnp.asarray(x0), spec=spec,
    )


def make_two_player(dt=None, num_time_steps=None, px0=0.0, py0=-10.0,
                    theta0=np.pi / 4, v0=5.0) -> Problem:
    """Two-player reachability: unicycle (P1, avoid) vs velocity
    disturbance (P2, reach)."""
    dyn = models.two_player_unicycle_4d()
    spec = dyn.spec(dt=dt, num_time_steps=num_time_steps)

    x0 = np.zeros(spec.xdim, np.float32)
    x0[:4] = [px0, py0, theta0, v0]

    circle = geometry.draw_circle(jnp.zeros(2), 1.0, 10)
    w = 0.1
    pc1 = PlayerCost(
        state_costs=(
            atoms.polyline2_signed_distance(circle, 0, 1, nominal=0.0,
                                            name="Target"),
        ),
        control_costs=((0, atoms.quadratic(w, None, 0.0, "ControlCost")),),
        structure=STRUCTURE_MAX,
    )
    pc2 = PlayerCost(
        state_costs=(
            atoms.polyline2_signed_distance(circle, 0, 1, nominal=1.0,
                                            name="Target"),
        ),
        control_costs=((1, atoms.quadratic(w, None, 0.0, "ControlCost")),),
        structure=STRUCTURE_MIN,
    )
    return Problem(
        name="two_player_reachability",
        dynamics=dyn, player_costs=(pc1, pc2), x0=jnp.asarray(x0), spec=spec,
    )


def make_three_player_collision_avoidance(
    dt=None, num_time_steps=None, d0=5.0, v0=5.0, buffer=3.0
) -> Problem:
    """Three 5D cars on a collision course; per-player cost is the max over
    time of the worse of its two pairwise signed-distance margins."""
    L = 4.0
    omega_max, a_max = 1.0, 0.1
    dyn = dyn_base.concatenate(
        "three_player_collision_avoidance_reachability",
        [models.car_5d(L)] * 3,
    )
    spec = dyn.spec(dt=dt, num_time_steps=num_time_steps)

    pert = 0.1
    x0 = np.zeros(spec.xdim, np.float32)
    x0[[0, 1, 2, 4]] = [d0, 0.0, -np.pi + pert, v0]
    x0[[5, 6, 7, 9]] = [-0.5 * d0, 0.5 * np.sqrt(3.0) * d0,
                        -np.pi / 3.0 + pert, v0]
    x0[[10, 11, 12, 14]] = [-0.5 * d0, -0.5 * np.sqrt(3.0) * d0,
                            np.pi / 3.0 + pert, v0]

    p = [(0, 1), (5, 6), (10, 11)]  # position dims per player
    sd12 = atoms.signed_distance(p[0], p[1], buffer, name="SD12")
    sd13 = atoms.signed_distance(p[0], p[2], buffer, name="SD13")
    sd23 = atoms.signed_distance(p[1], p[2], buffer, name="SD23")

    def box(player):
        return (
            (player, constraints.single_dimension(0, omega_max, True, "OmegaMax")),
            (player, constraints.single_dimension(0, -omega_max, False, "OmegaMin")),
            (player, constraints.single_dimension(1, a_max, True, "AMax")),
            (player, constraints.single_dimension(1, -a_max, False, "AMin")),
        )

    def player(i, pair):
        return PlayerCost(
            state_costs=(
                atoms.extreme_value(pair, is_min=False, name="Proximity"),
            ),
            control_costs=((i, atoms.quadratic(0.1, None, 0.0, "ControlCost")),),
            control_constraints=box(i),
            structure=STRUCTURE_MAX,
        )

    return Problem(
        name="three_player_collision_avoidance_reachability",
        dynamics=dyn,
        player_costs=(
            player(0, (sd12, sd13)),
            player(1, (sd12, sd23)),
            player(2, (sd23, sd13)),
        ),
        x0=jnp.asarray(x0),
        spec=spec,
    )


def make_problem(dt=None, num_time_steps=None) -> Problem:
    """Registry default: the three-player collision-avoidance batch
    problem (BASELINE config 5)."""
    return make_three_player_collision_avoidance(dt, num_time_steps)
