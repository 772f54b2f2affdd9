"""Route helpers: roundabout lane-center generation and operating-point
initialization along a route (reference src/roundabout_lane_center.cpp:51-108
and src/initialize_along_route.cpp:54-73)."""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ilqgames_tpu import geometry
from ilqgames_tpu.types import GameSpec, OperatingPoint

ROUNDABOUT_RADIUS = 12.0
LANE_HALF_WIDTH = 2.5


def roundabout_lane_center(entrance_angle: float, exit_angle: float,
                           distance_from_roundabout: float) -> np.ndarray:
    """Entry lane + 90-degree entry arc + roundabout arc + exit ray."""
    r = ROUNDABOUT_RADIUS
    w = LANE_HALF_WIDTH

    arc_center = np.array(
        [(r + w) * np.cos(entrance_angle), (r + w) * np.sin(entrance_angle)]
    )
    first_arc_angle = entrance_angle - np.pi / 2
    first_arc_point = arc_center + w * np.array(
        [np.cos(first_arc_angle), np.sin(first_arc_angle)]
    )

    points = [
        first_arc_point
        + distance_from_roundabout
        * np.array([np.cos(entrance_angle), np.sin(entrance_angle)]),
        first_arc_point,
    ]
    num_arc = 3
    for i in range(1, num_arc + 1):
        a = first_arc_angle - (np.pi / 2) * i / num_arc
        points.append(arc_center + w * np.array([np.cos(a), np.sin(a)]))

    num_round = 10
    for i in range(1, num_round + 1):
        a = entrance_angle + (exit_angle - entrance_angle) * i / num_round
        points.append(np.array([r * np.cos(a), r * np.sin(a)]))

    far = 1e4
    points.append(np.array([far * np.cos(exit_angle), far * np.sin(exit_angle)]))
    return np.stack(points).astype(np.float32)


def initialize_along_route(
    spec: GameSpec,
    op: OperatingPoint,
    route: np.ndarray,
    initial_route_pos: float,
    nominal_speed: float,
    position_dims,
) -> OperatingPoint:
    """Write the position dims of every knot to track the route at the
    nominal speed."""
    pts = jnp.asarray(route)
    ks = jnp.arange(spec.num_time_steps, dtype=jnp.float32)
    route_pos = initial_route_pos + nominal_speed * ks * spec.dt
    xy = jax.vmap(lambda p: geometry.polyline_point_at(pts, p))(route_pos)
    xs = op.xs.at[:, position_dims[0]].set(xy[:, 0])
    xs = xs.at[:, position_dims[1]].set(xy[:, 1])
    return op.replace(xs=xs)
