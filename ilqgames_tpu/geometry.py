"""Differentiable 2D geometry: line segments and polylines as arrays.

TPU-native re-design of the reference geometry layer
(geometry/line_segment2.h:52-90, geometry/polyline2.h:53-90,
src/polyline2.cpp, src/line_segment2.cpp, src/draw_shapes.cpp:51-75).

A polyline is a static (M, 2) float array of vertices. The closest-point
query vectorizes over all segments and selects with a first-occurrence
argmin, exactly mirroring the reference's sequential strict-< scan. The
discrete *choices* (which segment, vertex vs. interior, side fix) are
stop-gradiented so that `jax.grad`/`jax.hessian` of quantities built on
the signed distance reproduce the reference's analytic derivatives.

Sign convention: signed (squared) distance is positive when the query is
on the *right* of the segment direction (src/line_segment2.cpp Side()).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ilqgames_tpu.types import SMALL_NUMBER

_EPS = 1e-12


class ClosestPointResult(NamedTuple):
    """Everything the cost layer needs from a polyline closest-point query."""

    point: jnp.ndarray  # [2] closest point on the polyline
    signed_sq_distance: jnp.ndarray  # scalar; right of polyline is positive
    is_vertex: jnp.ndarray  # bool: closest point is a segment endpoint
    is_endpoint: jnp.ndarray  # bool: closest point is a polyline endpoint
    segment_start: jnp.ndarray  # [2] chosen segment's first point
    unit_direction: jnp.ndarray  # [2] chosen segment's unit direction


def segment_side(p1: jnp.ndarray, unit_dir: jnp.ndarray, query: jnp.ndarray):
    """True when `query` is on the right of the directed segment."""
    rel = query - p1
    cross = rel[0] * unit_dir[1] - unit_dir[0] * rel[1]
    return cross > 0.0


def polyline_cumulative_lengths(points: jnp.ndarray) -> jnp.ndarray:
    """[M] cumulative arc length at each vertex (first entry 0)."""
    seg_len = jnp.linalg.norm(jnp.diff(points, axis=0), axis=-1)
    return jnp.concatenate([jnp.zeros((1,), points.dtype), jnp.cumsum(seg_len)])


def polyline_point_at(points: jnp.ndarray, route_pos: jnp.ndarray) -> jnp.ndarray:
    """Walk `route_pos` meters along the polyline (reference Polyline2::PointAt,
    src/polyline2.cpp:68-90). Positions past the end clamp to the last segment's
    extrapolation, matching upper_bound-- semantics."""
    cum = polyline_cumulative_lengths(points)
    num_segments = points.shape[0] - 1
    # Index of the segment containing route_pos: last idx with cum[idx] <= pos.
    idx = jnp.clip(
        jnp.searchsorted(cum, route_pos, side="right") - 1, 0, num_segments - 1
    )
    idx = jax.lax.stop_gradient(idx)
    p1 = points[idx]
    p2 = points[idx + 1]
    seg_len = jnp.linalg.norm(p2 - p1)
    unit = (p2 - p1) / jnp.maximum(seg_len, _EPS)
    remaining = route_pos - cum[idx]
    return p1 + remaining * unit


def polyline_closest_point(
    points: jnp.ndarray, query: jnp.ndarray
) -> ClosestPointResult:
    """Closest point on the polyline with the reference's exact semantics
    (src/polyline2.cpp ClosestPoint + src/line_segment2.cpp ClosestPoint):

      * per-segment closest point (clamped projection) with signed squared
        distance, sign = side of the segment (right positive);
      * winner = first segment with strictly smallest |signed sq distance|;
      * when the winner's closest point is an interior *vertex* of the
        polyline, the sign is re-derived from the side of the "shortcut"
        segment spanning the neighboring vertices;
      * is_endpoint flags closest points at the global polyline ends.
    """
    p1s = points[:-1]  # [S, 2]
    p2s = points[1:]  # [S, 2]
    num_segments = p1s.shape[0]

    diffs = p2s - p1s
    lengths = jnp.linalg.norm(diffs, axis=-1)  # [S]
    units = diffs / jnp.maximum(lengths, _EPS)[:, None]  # [S, 2]

    rel = query[None, :] - p1s  # [S, 2]
    dots = jnp.sum(rel * units, axis=-1)  # [S]
    crosses = rel[:, 0] * units[:, 1] - units[:, 0] * rel[:, 1]  # [S]
    cross_signs = jnp.sign(crosses)

    # Candidate closest points for the three cases.
    interior_pts = p1s + dots[:, None] * units
    sq_p1 = jnp.sum(rel * rel, axis=-1)
    rel2 = query[None, :] - p2s
    sq_p2 = jnp.sum(rel2 * rel2, axis=-1)

    behind = dots < 0.0
    ahead = dots > lengths
    is_seg_endpoint = behind | ahead

    cp = jnp.where(
        behind[:, None], p1s, jnp.where(ahead[:, None], p2s, interior_pts)
    )
    ssd = jnp.where(
        behind,
        cross_signs * sq_p1,
        jnp.where(ahead, cross_signs * sq_p2, cross_signs * crosses * crosses),
    )

    best = jax.lax.stop_gradient(jnp.argmin(jnp.abs(ssd)))

    chosen_cp = cp[best]
    chosen_ssd = ssd[best]
    chosen_is_vertex = is_seg_endpoint[best]
    chosen_p1 = p1s[best]
    chosen_unit = units[best]

    # Interior-vertex side fix via the shortcut segment (polyline2.cpp:116-135).
    at_first = jax.lax.stop_gradient(~ahead[best])  # closest is p1 of segment
    # Shortcut spans (points[best-1], points[best+1]) when at p1, else
    # (points[best], points[best+2]); clamp indices for safety (the masked
    # branches below never use out-of-range values).
    i0 = jnp.where(at_first, jnp.maximum(best - 1, 0), best)
    i1 = jnp.where(
        at_first,
        jnp.minimum(best + 1, num_segments),
        jnp.minimum(best + 2, num_segments),
    )
    sc_p1 = points[i0]
    sc_p2 = points[i1]
    sc_len = jnp.linalg.norm(sc_p2 - sc_p1)
    sc_unit = (sc_p2 - sc_p1) / jnp.maximum(sc_len, _EPS)
    on_right = segment_side(sc_p1, sc_unit, query)

    # Eligible for the fix: endpoint of the segment AND an interior vertex of
    # the polyline (not the global first point of seg 0 or last of seg S-1).
    global_first = (best == 0) & at_first
    global_last = (best == num_segments - 1) & ~at_first
    fix = chosen_is_vertex & ~global_first & ~global_last
    fixed_ssd = jnp.where(on_right, jnp.abs(chosen_ssd), -jnp.abs(chosen_ssd))
    chosen_ssd = jnp.where(jax.lax.stop_gradient(fix), fixed_ssd, chosen_ssd)

    # Endpoint of the whole polyline? (polyline2.cpp is_same_point tolerance)
    d_first = jnp.sum((chosen_cp - points[0]) ** 2)
    d_last = jnp.sum((chosen_cp - points[-1]) ** 2)
    is_endpoint = (d_first < SMALL_NUMBER) | (d_last < SMALL_NUMBER)

    return ClosestPointResult(
        point=chosen_cp,
        signed_sq_distance=chosen_ssd,
        is_vertex=chosen_is_vertex,
        is_endpoint=is_endpoint,
        segment_start=chosen_p1,
        unit_direction=chosen_unit,
    )


def signed_distance(points: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Signed distance to the polyline (right positive), differentiable.

    In a segment's interior this is the affine cross product; at a vertex it
    is the (sign-fixed) Euclidean distance — so autodiff reproduces the
    reference's analytic gradients/Hessians in both branches.
    """
    res = polyline_closest_point(points, query)
    sign = jax.lax.stop_gradient(jnp.sign(res.signed_sq_distance))
    use_vertex = jax.lax.stop_gradient(res.is_vertex)

    # Interior branch: cross product with the (constant) segment frame.
    rel = query - jax.lax.stop_gradient(res.segment_start)
    u = jax.lax.stop_gradient(res.unit_direction)
    interior_sd = rel[0] * u[1] - u[0] * rel[1]

    # Vertex branch: sign * distance to the (constant) vertex.
    dv = query - jax.lax.stop_gradient(res.point)
    vertex_sd = sign * jnp.sqrt(jnp.maximum(jnp.sum(dv * dv), _EPS))

    return jnp.where(use_vertex, vertex_sd, interior_sd)


def draw_square(center: jnp.ndarray, side_length: float) -> jnp.ndarray:
    """Closed square polyline, counterclockwise from top-left
    (reference src/draw_shapes.cpp:51-63)."""
    h = 0.5 * side_length
    cx, cy = center[0], center[1]
    return jnp.array(
        [
            [cx - h, cy + h],
            [cx - h, cy - h],
            [cx + h, cy - h],
            [cx + h, cy + h],
            [cx - h, cy + h],
        ],
        jnp.float32,
    )


def draw_circle(center: jnp.ndarray, radius: float, num_segments: int) -> jnp.ndarray:
    """Closed circular polyline (reference src/draw_shapes.cpp:65-75)."""
    angles = jnp.linspace(0.0, 2.0 * jnp.pi, num_segments + 1)
    pts = jnp.stack(
        [center[0] + radius * jnp.cos(angles), center[1] + radius * jnp.sin(angles)],
        axis=-1,
    )
    return pts.astype(jnp.float32)
