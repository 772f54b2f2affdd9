"""Concrete dynamics models, matching the reference model zoo.

Each model is a pure continuous-time vector field plus ANALYTIC sparse
Jacobian entries (`jac`), matching the reference's hand-written
`Linearize` methods (all are I + dt * J of these fields; the dt*
discretization is applied by base.linearize_core). Autodiff
(base.linearize_autodiff) remains the oracle: tests/test_linearization.py
checks the analytic entries against jacfwd AND finite differences.

The analytic path exists because these Jacobians are traced INSIDE
Pallas kernels (ops/pallas/stage.py), where jacfwd's tangent-basis
bookkeeping does not lower on Mosaic (tools/tpu_stage_check.txt).

Reference files (include/ilqgames/dynamics/ + src/):
  single_player_point_mass_2d.{h,cpp}, single_player_dubins_car.{h,cpp},
  single_player_delayed_dubins_car.{h,cpp},
  single_player_unicycle_4d.{h,cpp} (src/...:53-60),
  single_player_unicycle_5d.{h,cpp}, single_player_car_5d.{h,cpp}
  (src/...:57-65), single_player_car_6d.{h,cpp} (src/...:58-67),
  single_player_car_7d.{h,cpp} (src/...:60-70),
  two_player_unicycle_4d.{h,cpp} (src/...:53-66), air_3d.{h,cpp}
  (src/air_3d.cpp:59-70).
"""

from __future__ import annotations

import jax.numpy as jnp

from ilqgames_tpu.dynamics.base import MultiPlayerDynamics, SinglePlayerModel


# --------------------------- single-player models ---------------------------
def point_mass_2d() -> SinglePlayerModel:
    """[px py vx vy] / [ax ay]."""

    def ode(t, x, u):
        return jnp.array([x[2], x[3], u[0], u[1]])

    def jac(t, x, u):
        return ([((0, 2), 1.0), ((1, 3), 1.0)],
                [((2, 0), 1.0), ((3, 1), 1.0)])

    return SinglePlayerModel("point_mass_2d", 4, 2, ode,
                             position_dims=(0, 1), jac=jac)


def dubins_car(speed: float) -> SinglePlayerModel:
    """[px py theta] / [omega] at fixed speed."""

    def ode(t, x, u):
        return jnp.array([speed * jnp.cos(x[2]), speed * jnp.sin(x[2]), u[0]])

    def jac(t, x, u):
        return ([((0, 2), -speed * jnp.sin(x[2])),
                 ((1, 2), speed * jnp.cos(x[2]))],
                [((2, 0), 1.0)])

    return SinglePlayerModel("dubins_car", 3, 1, ode,
                             position_dims=(0, 1), jac=jac)


def delayed_dubins_car(speed: float) -> SinglePlayerModel:
    """[px py theta omega] / [alpha] at fixed speed."""

    def ode(t, x, u):
        return jnp.array(
            [speed * jnp.cos(x[2]), speed * jnp.sin(x[2]), x[3], u[0]]
        )

    def jac(t, x, u):
        return ([((0, 2), -speed * jnp.sin(x[2])),
                 ((1, 2), speed * jnp.cos(x[2])),
                 ((2, 3), 1.0)],
                [((3, 0), 1.0)])

    return SinglePlayerModel("delayed_dubins_car", 4, 1, ode,
                             position_dims=(0, 1), jac=jac)


def unicycle_4d() -> SinglePlayerModel:
    """[px py theta v] / [omega a] (src/single_player_unicycle_4d.cpp:53-60)."""

    def ode(t, x, u):
        return jnp.array(
            [x[3] * jnp.cos(x[2]), x[3] * jnp.sin(x[2]), u[0], u[1]]
        )

    def jac(t, x, u):
        s, c = jnp.sin(x[2]), jnp.cos(x[2])
        return ([((0, 2), -x[3] * s), ((0, 3), c),
                 ((1, 2), x[3] * c), ((1, 3), s)],
                [((2, 0), 1.0), ((3, 1), 1.0)])

    return SinglePlayerModel("unicycle_4d", 4, 2, ode,
                             position_dims=(0, 1), jac=jac)


def unicycle_5d() -> SinglePlayerModel:
    """[px py theta v s] / [omega a]; s = path length."""

    def ode(t, x, u):
        return jnp.array(
            [x[3] * jnp.cos(x[2]), x[3] * jnp.sin(x[2]), u[0], u[1], x[3]]
        )

    def jac(t, x, u):
        s, c = jnp.sin(x[2]), jnp.cos(x[2])
        return ([((0, 2), -x[3] * s), ((0, 3), c),
                 ((1, 2), x[3] * c), ((1, 3), s),
                 ((4, 3), 1.0)],
                [((2, 0), 1.0), ((3, 1), 1.0)])

    return SinglePlayerModel("unicycle_5d", 5, 2, ode,
                             position_dims=(0, 1), jac=jac)


def car_5d(inter_axle_distance: float) -> SinglePlayerModel:
    """Bicycle model [px py theta phi v] / [omega a]
    (src/single_player_car_5d.cpp:57-65)."""
    L = inter_axle_distance

    def ode(t, x, u):
        return jnp.array(
            [
                x[4] * jnp.cos(x[2]),
                x[4] * jnp.sin(x[2]),
                (x[4] / L) * jnp.tan(x[3]),
                u[0],
                u[1],
            ]
        )

    def jac(t, x, u):
        s, c = jnp.sin(x[2]), jnp.cos(x[2])
        cos_phi = jnp.cos(x[3])
        sec2 = 1.0 / (cos_phi * cos_phi)
        return ([((0, 2), -x[4] * s), ((0, 4), c),
                 ((1, 2), x[4] * c), ((1, 4), s),
                 ((2, 3), (x[4] / L) * sec2), ((2, 4), jnp.tan(x[3]) / L)],
                [((3, 0), 1.0), ((4, 1), 1.0)])

    return SinglePlayerModel("car_5d", 5, 2, ode,
                             position_dims=(0, 1), jac=jac)


def car_6d(inter_axle_distance: float) -> SinglePlayerModel:
    """Bicycle with acceleration state [px py theta phi v a] / [omega jerk]
    (src/single_player_car_6d.cpp:58-67)."""
    L = inter_axle_distance

    def ode(t, x, u):
        return jnp.array(
            [
                x[4] * jnp.cos(x[2]),
                x[4] * jnp.sin(x[2]),
                (x[4] / L) * jnp.tan(x[3]),
                u[0],
                x[5],
                u[1],
            ]
        )

    def jac(t, x, u):
        s, c = jnp.sin(x[2]), jnp.cos(x[2])
        cos_phi = jnp.cos(x[3])
        sec2 = 1.0 / (cos_phi * cos_phi)
        return ([((0, 2), -x[4] * s), ((0, 4), c),
                 ((1, 2), x[4] * c), ((1, 4), s),
                 ((2, 3), (x[4] / L) * sec2), ((2, 4), jnp.tan(x[3]) / L),
                 ((4, 5), 1.0)],
                [((3, 0), 1.0), ((5, 1), 1.0)])

    return SinglePlayerModel("car_6d", 6, 2, ode,
                             position_dims=(0, 1), jac=jac)


def car_7d(inter_axle_distance: float) -> SinglePlayerModel:
    """Bicycle with curvature and path length
    [px py theta phi v kappa s] / [omega a]
    (src/single_player_car_7d.cpp:60-70)."""
    L = inter_axle_distance

    def ode(t, x, u):
        sec_phi = 1.0 / jnp.cos(x[3])
        return jnp.array(
            [
                x[4] * jnp.cos(x[2]),
                x[4] * jnp.sin(x[2]),
                (x[4] / L) * jnp.tan(x[3]),
                u[0],
                u[1],
                u[0] * sec_phi * sec_phi / L,
                x[4],
            ]
        )

    def jac(t, x, u):
        s, c = jnp.sin(x[2]), jnp.cos(x[2])
        cos_phi = jnp.cos(x[3])
        sec2 = 1.0 / (cos_phi * cos_phi)
        tan_phi = jnp.tan(x[3])
        return ([((0, 2), -x[4] * s), ((0, 4), c),
                 ((1, 2), x[4] * c), ((1, 4), s),
                 ((2, 3), (x[4] / L) * sec2), ((2, 4), tan_phi / L),
                 ((5, 3), 2.0 * u[0] * sec2 * tan_phi / L),
                 ((6, 4), 1.0)],
                [((3, 0), 1.0), ((4, 1), 1.0),
                 ((5, 0), sec2 / L)])

    return SinglePlayerModel("car_7d", 7, 2, ode,
                             position_dims=(0, 1), jac=jac)


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

    def ode_jac(t, x, us):
        s, c = jnp.sin(x[2]), jnp.cos(x[2])
        return ([((0, 2), -x[3] * s), ((0, 3), c),
                 ((1, 2), x[3] * c), ((1, 3), s)],
                [((2, 0, 0), 1.0), ((3, 0, 1), 1.0),
                 ((0, 1, 0), 1.0), ((1, 1, 1), 1.0)])

    return MultiPlayerDynamics(
        name="two_player_unicycle_4d",
        xdims=(4, 0),
        udims=(2, 2),
        ode=ode,
        position_dims=((0, 1), (0, 1)),
        ode_jac=ode_jac,
    )


def air_3d(evader_speed: float, pursuer_speed: float) -> MultiPlayerDynamics:
    """Classic HJ pursuit-evasion relative dynamics [rx ry rtheta];
    u1 = evader turn rate, u2 = pursuer turn rate (reference dynamics/air_3d.h,
    src/air_3d.cpp:59-70)."""

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

    def ode_jac(t, x, us):
        w1 = us[0, 0]
        return ([((0, 1), w1), ((0, 2), -pursuer_speed * jnp.sin(x[2])),
                 ((1, 0), -w1), ((1, 2), pursuer_speed * jnp.cos(x[2]))],
                [((0, 0, 0), x[1]), ((1, 0, 0), -x[0]),
                 ((2, 0, 0), -1.0), ((2, 1, 0), 1.0)])

    return MultiPlayerDynamics(
        name="air_3d",
        xdims=(3, 0),
        udims=(1, 1),
        ode=ode,
        position_dims=((0, 1), (0, 1)),
        ode_jac=ode_jac,
    )
