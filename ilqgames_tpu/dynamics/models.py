"""Concrete dynamics models, matching the reference model zoo.

Each model is a pure continuous-time vector field; discrete Jacobians come
from autodiff (see base.linearize), which reproduces the reference's
analytic `Linearize` methods exactly (all are I + dt * J of these fields).

Reference files (include/ilqgames/dynamics/):
  single_player_point_mass_2d.h, single_player_dubins_car.h,
  single_player_delayed_dubins_car.h, single_player_unicycle_4d.h,
  single_player_unicycle_5d.h, single_player_car_5d.h,
  single_player_car_6d.h, single_player_car_7d.h,
  two_player_unicycle_4d.h, air_3d.h.
"""

from __future__ import annotations

import jax.numpy as jnp

from ilqgames_tpu.dynamics.base import MultiPlayerDynamics, SinglePlayerModel


# --------------------------- single-player models ---------------------------
def point_mass_2d() -> SinglePlayerModel:
    """[px py vx vy] / [ax ay]."""

    def ode(t, x, u):
        return jnp.array([x[2], x[3], u[0], u[1]])

    return SinglePlayerModel("point_mass_2d", 4, 2, ode, position_dims=(0, 1))


def dubins_car(speed: float) -> SinglePlayerModel:
    """[px py theta] / [omega] at fixed speed."""

    def ode(t, x, u):
        return jnp.array([speed * jnp.cos(x[2]), speed * jnp.sin(x[2]), u[0]])

    return SinglePlayerModel("dubins_car", 3, 1, ode, position_dims=(0, 1))


def delayed_dubins_car(speed: float) -> SinglePlayerModel:
    """[px py theta omega] / [alpha] at fixed speed."""

    def ode(t, x, u):
        return jnp.array(
            [speed * jnp.cos(x[2]), speed * jnp.sin(x[2]), x[3], u[0]]
        )

    return SinglePlayerModel("delayed_dubins_car", 4, 1, ode, position_dims=(0, 1))


def unicycle_4d() -> SinglePlayerModel:
    """[px py theta v] / [omega a]."""

    def ode(t, x, u):
        return jnp.array(
            [x[3] * jnp.cos(x[2]), x[3] * jnp.sin(x[2]), u[0], u[1]]
        )

    return SinglePlayerModel("unicycle_4d", 4, 2, ode, position_dims=(0, 1))


def unicycle_5d() -> SinglePlayerModel:
    """[px py theta v s] / [omega a]; s = path length."""

    def ode(t, x, u):
        return jnp.array(
            [x[3] * jnp.cos(x[2]), x[3] * jnp.sin(x[2]), u[0], u[1], x[3]]
        )

    return SinglePlayerModel("unicycle_5d", 5, 2, ode, position_dims=(0, 1))


def car_5d(inter_axle_distance: float) -> SinglePlayerModel:
    """Bicycle model [px py theta phi v] / [omega a]."""

    def ode(t, x, u):
        return jnp.array(
            [
                x[4] * jnp.cos(x[2]),
                x[4] * jnp.sin(x[2]),
                (x[4] / inter_axle_distance) * jnp.tan(x[3]),
                u[0],
                u[1],
            ]
        )

    return SinglePlayerModel("car_5d", 5, 2, ode, position_dims=(0, 1))


def car_6d(inter_axle_distance: float) -> SinglePlayerModel:
    """Bicycle with acceleration state [px py theta phi v a] / [omega jerk]."""

    def ode(t, x, u):
        return jnp.array(
            [
                x[4] * jnp.cos(x[2]),
                x[4] * jnp.sin(x[2]),
                (x[4] / inter_axle_distance) * jnp.tan(x[3]),
                u[0],
                x[5],
                u[1],
            ]
        )

    return SinglePlayerModel("car_6d", 6, 2, ode, position_dims=(0, 1))


def car_7d(inter_axle_distance: float) -> SinglePlayerModel:
    """Bicycle with curvature and path length
    [px py theta phi v kappa s] / [omega a]."""

    def ode(t, x, u):
        sec_phi = 1.0 / jnp.cos(x[3])
        return jnp.array(
            [
                x[4] * jnp.cos(x[2]),
                x[4] * jnp.sin(x[2]),
                (x[4] / inter_axle_distance) * jnp.tan(x[3]),
                u[0],
                u[1],
                u[0] * sec_phi * sec_phi / inter_axle_distance,
                x[4],
            ]
        )

    return SinglePlayerModel("car_7d", 7, 2, ode, position_dims=(0, 1))


# --------------------------- multi-player models ----------------------------
def two_player_unicycle_4d() -> MultiPlayerDynamics:
    """Monolithic 2-player unicycle: P1 drives [omega a], P2 is a position
    disturbance [dx dy] (reference dynamics/two_player_unicycle_4d.h)."""

    def ode(t, x, us):
        return jnp.array(
            [
                x[3] * jnp.cos(x[2]) + us[1, 0],
                x[3] * jnp.sin(x[2]) + us[1, 1],
                us[0, 0],
                us[0, 1],
            ]
        )

    return MultiPlayerDynamics(
        name="two_player_unicycle_4d",
        xdims=(4, 0),
        udims=(2, 2),
        ode=ode,
        position_dims=((0, 1), (0, 1)),
    )


def air_3d(evader_speed: float, pursuer_speed: float) -> MultiPlayerDynamics:
    """Classic HJ pursuit-evasion relative dynamics [rx ry rtheta];
    u1 = evader turn rate, u2 = pursuer turn rate (reference dynamics/air_3d.h)."""

    def ode(t, x, us):
        w1 = us[0, 0]
        w2 = us[1, 0]
        return jnp.array(
            [
                -evader_speed + pursuer_speed * jnp.cos(x[2]) + w1 * x[1],
                pursuer_speed * jnp.sin(x[2]) - w1 * x[0],
                w2 - w1,
            ]
        )

    return MultiPlayerDynamics(
        name="air_3d",
        xdims=(3, 0),
        udims=(1, 1),
        ode=ode,
        position_dims=((0, 1), (0, 1)),
    )
