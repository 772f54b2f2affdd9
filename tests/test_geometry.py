"""Geometry unit tests mirroring test_polyline2.cpp / test_line_segment2.cpp:
closest points (interior, vertex, endpoint), side convention (positive on
the right of the direction of travel), point-at-arclength, and shapes."""

import numpy as np
import jax.numpy as jnp

from ilqgames_tpu import geometry

# An L-shaped polyline: up the y-axis then right along y=2.
PTS = np.array([[0.0, 0.0], [0.0, 2.0], [2.0, 2.0]], np.float32)


def cp(q):
    return geometry.polyline_closest_point(jnp.asarray(PTS), jnp.asarray(q))


def test_interior_closest_point():
    res = cp([1.0, 1.0])
    np.testing.assert_allclose(np.asarray(res.point), [0.0, 1.0], atol=1e-6)
    assert not bool(res.is_vertex)
    assert not bool(res.is_endpoint)
    # Right of the upward segment (+x side) => positive signed sq distance.
    assert float(res.signed_sq_distance) > 0.0
    res_left = cp([-1.0, 1.0])
    assert float(res_left.signed_sq_distance) < 0.0


def test_vertex_closest_point():
    res = cp([-1.0, 3.0])
    np.testing.assert_allclose(np.asarray(res.point), [0.0, 2.0], atol=1e-6)
    assert bool(res.is_vertex)
    assert not bool(res.is_endpoint)


def test_endpoint_closest_point():
    res = cp([0.0, -1.0])
    np.testing.assert_allclose(np.asarray(res.point), [0.0, 0.0], atol=1e-6)
    assert bool(res.is_endpoint)
    res2 = cp([3.5, 2.0])
    np.testing.assert_allclose(np.asarray(res2.point), [2.0, 2.0], atol=1e-6)
    assert bool(res2.is_endpoint)


def test_signed_distance_magnitude():
    sd = geometry.signed_distance(jnp.asarray(PTS), jnp.asarray([1.0, 1.0]))
    np.testing.assert_allclose(float(sd), 1.0, atol=1e-5)
    sd_left = geometry.signed_distance(
        jnp.asarray(PTS), jnp.asarray([-0.5, 1.0])
    )
    np.testing.assert_allclose(float(sd_left), -0.5, atol=1e-5)


def test_point_at_arclength():
    p = geometry.polyline_point_at(jnp.asarray(PTS), jnp.float32(1.0))
    np.testing.assert_allclose(np.asarray(p), [0.0, 1.0], atol=1e-6)
    p2 = geometry.polyline_point_at(jnp.asarray(PTS), jnp.float32(3.0))
    np.testing.assert_allclose(np.asarray(p2), [1.0, 2.0], atol=1e-6)
    # Past the end: extrapolates along the final segment (upper_bound--).
    p3 = geometry.polyline_point_at(jnp.asarray(PTS), jnp.float32(5.0))
    np.testing.assert_allclose(np.asarray(p3), [3.0, 2.0], atol=1e-6)


def test_draw_shapes():
    circle = geometry.draw_circle(jnp.zeros(2), 2.0, 16)
    radii = np.linalg.norm(np.asarray(circle), axis=-1)
    np.testing.assert_allclose(radii, 2.0, atol=1e-5)
    square = geometry.draw_square(jnp.zeros(2), 2.0)
    assert np.abs(np.asarray(square)).max() == 1.0


def test_cumulative_lengths():
    cum = geometry.polyline_cumulative_lengths(jnp.asarray(PTS))
    np.testing.assert_allclose(np.asarray(cum), [0.0, 2.0, 4.0], atol=1e-6)
