"""Differentiable 2D geometry: line segments and polylines as arrays.

TPU-native re-design of the reference geometry layer
(geometry/line_segment2.h:52-90, geometry/polyline2.h:53-90,
src/polyline2.cpp, src/line_segment2.cpp, src/draw_shapes.cpp:51-75).

A polyline is a static (M, 2) array of vertices. The closest-point query
is UNROLLED over the (few, static) segments with pure Python-float
constants, so its trace contains no array constants and no gathers — it
lowers to elementwise ops and therefore runs unchanged inside Pallas TPU
kernels (which reject closure-captured array constants). The winner is
the first segment with strictly smallest |signed sq distance|, exactly
mirroring the reference's sequential strict-< scan, implemented as
exclusive where-masks. The discrete *choices* (which segment, vertex vs.
interior, side fix) are stop-gradiented so that `jax.grad`/`jax.hessian`
of quantities built on the signed distance reproduce the reference's
analytic derivatives.

Sign convention: signed (squared) distance is positive when the query is
on the *right* of the segment direction (src/line_segment2.cpp Side()).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

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


class ClosestPointXY(NamedTuple):
    """Scalar-component form of ClosestPointResult. Inside Pallas kernels
    every [2]-vector stack/index pair becomes, under the sweep kernel's
    double vmap, an array with the 2-axis in the LANE-minor position plus
    a cross-lane transpose — which Mosaic lowers pathologically (measured
    ~100 us/knot of pure relayout, tools/sweep_floor5*.txt). Kernel-path
    consumers use this unstacked form; values are bitwise identical."""

    cpx: jnp.ndarray  # closest point x
    cpy: jnp.ndarray  # closest point y
    signed_sq_distance: jnp.ndarray
    is_vertex: jnp.ndarray
    is_endpoint: jnp.ndarray
    p1x: jnp.ndarray  # chosen segment's first point
    p1y: jnp.ndarray
    ux: jnp.ndarray  # chosen segment's unit direction
    uy: jnp.ndarray


def segment_side(p1: jnp.ndarray, unit_dir: jnp.ndarray, query: jnp.ndarray):
    """True when `query` is on the right of the directed segment."""
    rel = query - p1
    cross = rel[0] * unit_dir[1] - unit_dir[0] * rel[1]
    return cross > 0.0


def _static_segments(points):
    """Per-segment Python-float constants: (p1, p2, unit, length) tuples."""
    # float32 arithmetic so inlined literals match what the previous
    # jnp-constant implementation computed on-device.
    pts = np.asarray(points, np.float32)
    segs = []
    for s in range(pts.shape[0] - 1):
        p1 = pts[s]
        p2 = pts[s + 1]
        d = p2 - p1
        length = float(np.sqrt(np.float32(d @ d)))
        denom = np.float32(max(length, _EPS))
        ux, uy = (d / denom).tolist()
        segs.append((
            (float(p1[0]), float(p1[1])),
            (float(p2[0]), float(p2[1])),
            (float(ux), float(uy)),
            length,
        ))
    return pts, segs


def polyline_cumulative_lengths(points: jnp.ndarray) -> jnp.ndarray:
    """[M] cumulative arc length at each vertex (first entry 0)."""
    seg_len = jnp.linalg.norm(jnp.diff(points, axis=0), axis=-1)
    return jnp.concatenate([jnp.zeros((1,), points.dtype), jnp.cumsum(seg_len)])


def polyline_point_at(points: jnp.ndarray, route_pos: jnp.ndarray) -> jnp.ndarray:
    """Walk `route_pos` meters along the polyline (reference Polyline2::PointAt,
    src/polyline2.cpp:68-90). Positions past the end clamp to the last segment's
    extrapolation, matching upper_bound-- semantics. Unrolled over segments
    (last segment with cumulative length <= route_pos wins)."""
    _, segs = _static_segments(points)
    cum = 0.0
    px = py = None
    for s, (p1, _p2, (ux, uy), length) in enumerate(segs):
        rem = route_pos - cum
        cand_x = p1[0] + rem * ux
        cand_y = p1[1] + rem * uy
        if s == 0:
            px, py = cand_x, cand_y
        else:
            inside = route_pos >= cum
            px = jnp.where(inside, cand_x, px)
            py = jnp.where(inside, cand_y, py)
        cum += length
    return jnp.stack([px, py])


def polyline_closest_point(
    points: jnp.ndarray, query: jnp.ndarray, need_sign: bool = True
) -> ClosestPointResult:
    """Stacked-API wrapper around `polyline_closest_point_xy` (see its
    docstring for semantics). Prefer the _xy form inside Pallas kernels —
    the [2]-stacks built here are pure relayout cost under Mosaic."""
    r = polyline_closest_point_xy(points, query[0], query[1],
                                  need_sign=need_sign)
    return ClosestPointResult(
        point=jnp.stack([r.cpx, r.cpy]),
        signed_sq_distance=r.signed_sq_distance,
        is_vertex=r.is_vertex,
        is_endpoint=r.is_endpoint,
        segment_start=jnp.stack([r.p1x, r.p1y]),
        unit_direction=jnp.stack([r.ux, r.uy]),
    )


def polyline_closest_point_xy(
    points: jnp.ndarray, qx: jnp.ndarray, qy: jnp.ndarray,
    need_sign: bool = True
) -> ClosestPointXY:
    """Closest point on the polyline with the reference's exact semantics
    (src/polyline2.cpp ClosestPoint + src/line_segment2.cpp ClosestPoint):

      * per-segment closest point (clamped projection) with signed squared
        distance, sign = side of the segment (right positive);
      * winner = first segment with strictly smallest |signed sq distance|;
      * when the winner's closest point is an interior *vertex* of the
        polyline, the sign is re-derived from the side of the "shortcut"
        segment spanning the neighboring vertices;
      * is_endpoint flags closest points at the global polyline ends.

    need_sign=False skips the sign and interior-vertex side-fix
    arithmetic (which only ever flip the sign, never the magnitude) and
    returns |signed_sq_distance| instead (~1/4 of the per-segment
    trace), for consumers that only use the magnitude
    (quadratic_polyline2: |ssd|, gradients, and the winner argmin are
    all sign-free). Pallas kernels get no dead-code elimination (the
    traced jaxpr is lowered verbatim by Mosaic), so the pruning must
    happen at trace time. Both modes keep the reference's shipped
    sgn(0) == 0 quirk (utils/types.h:158-160): an exactly-collinear
    off-end candidate has signed sq distance 0 and can win the argmin —
    on straight lanes this is routine (rollouts hold x constant), so it
    is load-bearing behavior, not a corner case.
    """
    pts, segs = _static_segments(points)
    S = len(segs)

    # ---- per-segment candidates (all scalar ops, float constants) ----
    cand = []
    for s, (p1, p2, (ux, uy), length) in enumerate(segs):
        rx, ry = qx - p1[0], qy - p1[1]
        dot = rx * ux + ry * uy
        cross = rx * uy - ux * ry
        sq_p1 = rx * rx + ry * ry
        r2x, r2y = qx - p2[0], qy - p2[1]
        sq_p2 = r2x * r2x + r2y * r2y

        behind = dot < 0.0
        ahead = dot > length
        is_seg_endpoint = behind | ahead

        cpx = jnp.where(behind, p1[0],
                        jnp.where(ahead, p2[0], p1[0] + dot * ux))
        cpy = jnp.where(behind, p1[1],
                        jnp.where(ahead, p2[1], p1[1] + dot * uy))
        abs_raw = jnp.where(
            behind, sq_p1, jnp.where(ahead, sq_p2, cross * cross))
        # |sgn(cross) * d^2|: the reference's sgn() is 0 at 0 (shipped
        # utils/types.h:158-160), so exactly-collinear off-end candidates
        # collapse to |ssd| = 0 and can win the argmin — replicated.
        abs_ssd = jnp.where(cross == 0.0, 0.0, abs_raw)

        if not need_sign:
            cand.append(dict(
                cpx=cpx, cpy=cpy, ssd=abs_ssd, is_vertex=is_seg_endpoint,
                p1=p1, unit=(ux, uy),
            ))
            continue

        cross_sign = jnp.sign(cross)
        ssd = cross_sign * abs_ssd

        # Interior-vertex side fix via the shortcut segment
        # (polyline2.cpp:116-135): when the closest point is p1 of segment
        # s the shortcut spans (pts[s-1], pts[s+1]), else (pts[s], pts[s+2]);
        # indices clamp for safety (the masked branches below never use
        # out-of-range values).
        at_first = jax.lax.stop_gradient(~ahead)
        a0 = pts[max(s - 1, 0)]
        a1 = pts[min(s + 1, S)]
        b0 = pts[s]
        b1 = pts[min(s + 2, S)]

        def _sc(pa, pb):
            d = pb - pa
            ln = max(float(np.sqrt(d @ d)), _EPS)
            return float(pa[0]), float(pa[1]), float(d[0] / ln), float(d[1] / ln)

        ax0, ay0, aux, auy = _sc(a0, a1)
        bx0, by0, bux, buy = _sc(b0, b1)
        scx0 = jnp.where(at_first, ax0, bx0)
        scy0 = jnp.where(at_first, ay0, by0)
        scux = jnp.where(at_first, aux, bux)
        scuy = jnp.where(at_first, auy, buy)
        on_right = ((qx - scx0) * scuy - scux * (qy - scy0)) > 0.0

        # Eligible: endpoint of the segment AND an interior polyline vertex
        # (not the global first point of seg 0 / last of seg S-1).
        global_first = at_first if s == 0 else jnp.asarray(False)
        global_last = ~at_first if s == S - 1 else jnp.asarray(False)
        fix = is_seg_endpoint & ~global_first & ~global_last
        fixed_ssd = jnp.where(on_right, jnp.abs(ssd), -jnp.abs(ssd))
        ssd = jnp.where(jax.lax.stop_gradient(fix), fixed_ssd, ssd)

        cand.append(dict(
            cpx=cpx, cpy=cpy, ssd=ssd, is_vertex=is_seg_endpoint,
            p1=p1, unit=(ux, uy),
        ))

    # ---- first-occurrence winner (strict-< scan) as exclusive masks ----
    absd = [jax.lax.stop_gradient(jnp.abs(c["ssd"])) for c in cand]
    m = absd[0]
    for a in absd[1:]:
        m = jnp.minimum(m, a)
    sel = []
    taken = jnp.zeros_like(m, dtype=bool)
    for a in absd:
        hit = (a <= m) & ~taken
        sel.append(hit)
        taken = taken | hit

    def pick(vals):
        acc = vals[0]
        for s in range(1, S):
            acc = jnp.where(sel[s], vals[s], acc)
        return acc

    cpx = pick([c["cpx"] for c in cand])
    cpy = pick([c["cpy"] for c in cand])
    chosen_ssd = pick([c["ssd"] for c in cand])
    # Bool select lowers to an unsupported i1 truncation in Mosaic; pick
    # a 0/1 float and re-threshold.
    chosen_is_vertex = pick(
        [c["is_vertex"].astype(jnp.float32) for c in cand]) > 0.5
    p1x = pick([jnp.full_like(qx, c["p1"][0]) for c in cand])
    p1y = pick([jnp.full_like(qx, c["p1"][1]) for c in cand])
    unx = pick([jnp.full_like(qx, c["unit"][0]) for c in cand])
    uny = pick([jnp.full_like(qx, c["unit"][1]) for c in cand])

    # Endpoint of the whole polyline? (polyline2.cpp is_same_point tolerance)
    fx, fy = float(pts[0][0]), float(pts[0][1])
    lx, ly = float(pts[-1][0]), float(pts[-1][1])
    d_first = (cpx - fx) ** 2 + (cpy - fy) ** 2
    d_last = (cpx - lx) ** 2 + (cpy - ly) ** 2
    is_endpoint = (d_first < SMALL_NUMBER) | (d_last < SMALL_NUMBER)

    return ClosestPointXY(
        cpx=cpx,
        cpy=cpy,
        signed_sq_distance=chosen_ssd,
        is_vertex=chosen_is_vertex,
        is_endpoint=is_endpoint,
        p1x=p1x,
        p1y=p1y,
        ux=unx,
        uy=uny,
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
