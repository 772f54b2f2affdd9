"""The concrete cost library (19 cost types), as pure-function builders.

Each builder returns a `Cost` whose `evaluate(t_rel, v)` matches the
reference cost's Evaluate bit-for-bit in exact arithmetic, and whose
quadraticization matches the reference's *shipped* Quadraticize — via
autodiff where the shipped formulas are the true derivatives, via a custom
`quad_fn` where they deviate (the convex-proximity family's missing sgn()
factors and the polyline family's branch-specific forms), since those
quirks affect the solver's fixed point.

Reference files cited per builder (include/ilqgames/cost/*, src/*.cpp).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ilqgames_tpu import geometry
from ilqgames_tpu.costs.base import Cost, assemble_matrix, assemble_vector

_EPS = 1e-12


def _safe_hypot(dx, dy):
    return jnp.sqrt(jnp.maximum(dx * dx + dy * dy, _EPS))


def _sgn(x):
    """Reference sgn: (x > 0) - (x < 0), so sgn(0) == 0 (utils/types.h:154)."""
    return jnp.sign(x)


# ---------------------------------------------------------------------------
# Simple quadratics (src/quadratic_cost.cpp, src/semiquadratic_cost.cpp).
# ---------------------------------------------------------------------------
def quadratic(weight: float, dim: Optional[int], nominal: float = 0.0,
              name: str = "quadratic") -> Cost:
    """0.5*w*(v[dim]-nominal)^2, or over all dims when dim is None
    (reference dimension == -1)."""

    if dim is None:
        def evaluate(t, v):
            d = v - nominal
            return 0.5 * weight * jnp.sum(d * d)

        def grad_pairs_all(t, v):
            return [(d_, weight * (v[d_] - nominal))
                    for d_ in range(v.shape[0])]

        def quad_pairs_all(t, v):
            # w*I over ALL dims (incl. control padding dims), exactly as
            # dense autodiff of `evaluate` produces.
            return ([((d_, d_), jnp.full_like(v[0], weight))
                     for d_ in range(v.shape[0])],
                    grad_pairs_all(t, v))

        return Cost(name, evaluate, grad_pairs_fn=grad_pairs_all,
                    quad_pairs_fn=quad_pairs_all)

    def evaluate(t, v):
        d = v[dim] - nominal
        return 0.5 * weight * d * d

    def grad_pairs(t, v):
        # w*d == 2*fl(0.5w*d): bitwise-equal to autodiff of evaluate.
        return [(dim, weight * (v[dim] - nominal))]

    def quad_pairs(t, v):
        return ([((dim, dim), jnp.full_like(v[0], weight))],
                grad_pairs(t, v))

    return Cost(name, evaluate, support=(dim,), grad_pairs_fn=grad_pairs,
                quad_pairs_fn=quad_pairs)


def semiquadratic(weight: float, dim: int, threshold: float,
                  oriented_right: bool, name: str = "semiquadratic") -> Cost:
    """One-sided quadratic above (oriented_right) or below the threshold."""

    def evaluate(t, v):
        diff = v[dim] - threshold
        active = (diff > 0.0) if oriented_right else (diff < 0.0)
        return jnp.where(active, 0.5 * weight * diff * diff, 0.0)

    def grad_pairs(t, v):
        diff = v[dim] - threshold
        active = (diff > 0.0) if oriented_right else (diff < 0.0)
        return [(dim, jnp.where(active, weight * diff, 0.0))]

    def quad_pairs(t, v):
        diff = v[dim] - threshold
        active = (diff > 0.0) if oriented_right else (diff < 0.0)
        return ([((dim, dim), jnp.where(active, weight, 0.0))],
                grad_pairs(t, v))

    return Cost(name, evaluate, support=(dim,), grad_pairs_fn=grad_pairs,
                quad_pairs_fn=quad_pairs)


def quadratic_norm(weight: float, dim1: int, dim2: int, nominal: float,
                   name: str = "quadratic_norm") -> Cost:
    """0.5*w*(||(v[d1],v[d2])|| - nominal)^2 (src/quadratic_norm_cost.cpp)."""

    def evaluate(t, v):
        diff = _safe_hypot(v[dim1], v[dim2]) - nominal
        return 0.5 * weight * diff * diff

    def grad_pairs(t, v):
        norm = _safe_hypot(v[dim1], v[dim2])
        ct = weight * (norm - nominal) / norm
        return [(dim1, ct * v[dim1]), (dim2, ct * v[dim2])]

    return Cost(name, evaluate, support=(dim1, dim2),
                grad_pairs_fn=grad_pairs)


def semiquadratic_norm(weight: float, dim1: int, dim2: int, threshold: float,
                       oriented_right: bool,
                       name: str = "semiquadratic_norm") -> Cost:
    """One-sided version of quadratic_norm (src/semiquadratic_norm_cost.cpp)."""

    def evaluate(t, v):
        diff = _safe_hypot(v[dim1], v[dim2]) - threshold
        active = (diff > 0.0) if oriented_right else (diff < 0.0)
        return jnp.where(active, 0.5 * weight * diff * diff, 0.0)

    def quad_fn(t, v):
        # The shipped quadraticize activates on >=/<= of the *norm* (ties
        # included), src/semiquadratic_norm_cost.cpp:26-31.
        norm = _safe_hypot(v[dim1], v[dim2])
        active = (norm >= threshold) if oriented_right else (norm <= threshold)
        g = jax.grad(
            lambda vv: 0.5 * weight * (_safe_hypot(vv[dim1], vv[dim2]) - threshold) ** 2
        )
        grad = jnp.where(active, g(v), jnp.zeros_like(v))
        h = jax.hessian(
            lambda vv: 0.5 * weight * (_safe_hypot(vv[dim1], vv[dim2]) - threshold) ** 2
        )(v)
        hess = jnp.where(active, h, jnp.zeros_like(h))
        return hess, grad

    return Cost(name, evaluate, quad_fn)


def quadratic_difference(weight: float, dims1: Sequence[int],
                         dims2: Sequence[int],
                         name: str = "quadratic_difference") -> Cost:
    """0.5*w*sum_i (v[dims1[i]] - v[dims2[i]])^2
    (src/quadratic_difference_cost.cpp)."""
    d1 = tuple(dims1)
    d2 = tuple(dims2)

    def evaluate(t, v):
        total = 0.0
        for a, b in zip(d1, d2):
            diff = v[a] - v[b]
            total = total + diff * diff
        return 0.5 * weight * total

    return Cost(name, evaluate, support=tuple(d1) + tuple(d2))


def relative_distance(weight: float, dims1: Tuple[int, int],
                      dims2: Tuple[int, int],
                      name: str = "relative_distance") -> Cost:
    """w * ||p1 - p2|| (src/relative_distance_cost.cpp)."""

    def evaluate(t, v):
        return weight * _safe_hypot(v[dims1[0]] - v[dims2[0]],
                                    v[dims1[1]] - v[dims2[1]])

    return Cost(name, evaluate, support=tuple(dims1) + tuple(dims2))


def signed_distance(dims1: Tuple[int, int], dims2: Tuple[int, int],
                    nominal: float = 0.0, less_is_positive: bool = True,
                    name: str = "signed_distance") -> Cost:
    """nominal - ||p1-p2|| (or its negation). NOTE: the reference applies no
    weight to this cost (src/signed_distance_cost.cpp Evaluate)."""
    s = 1.0 if less_is_positive else -1.0

    def evaluate(t, v):
        d = _safe_hypot(v[dims1[0]] - v[dims2[0]], v[dims1[1]] - v[dims2[1]])
        return s * (nominal - d)

    def grad_pairs(t, v):
        dx = v[dims1[0]] - v[dims2[0]]
        dy = v[dims1[1]] - v[dims2[1]]
        ssq = dx * dx + dy * dy
        d = jnp.sqrt(jnp.maximum(ssq, _EPS))
        # Bitwise-matches autodiff of `evaluate`: sqrt's vjp rounds
        # fl(fl(-s*0.5)/d), the x*x+y*y vjp doubles fl(ct*dx) exactly,
        # and maximum's vjp zeroes the gradient when the clamp is active.
        live = (ssq > _EPS).astype(jnp.float32)
        ct = ((-s) * 0.5) / d * live
        px = ct * dx
        py = ct * dy
        gx = px + px
        gy = py + py
        return [(dims1[0], gx), (dims1[1], gy),
                (dims2[0], -gx), (dims2[1], -gy)]

    return Cost(name, evaluate, support=tuple(dims1) + tuple(dims2),
                grad_pairs_fn=grad_pairs)


# ---------------------------------------------------------------------------
# Proximity family.
# ---------------------------------------------------------------------------
def proximity(weight: float, dims1: Tuple[int, int], dims2: Tuple[int, int],
              threshold: float, name: str = "proximity") -> Cost:
    """0.5*w*(threshold - ||p1-p2||)^2, active only within the threshold
    (src/proximity_cost.cpp:52-123); shipped derivatives are the true ones."""
    threshold_sq = threshold * threshold

    def evaluate(t, v):
        dx = v[dims1[0]] - v[dims2[0]]
        dy = v[dims1[1]] - v[dims2[1]]
        delta_sq = dx * dx + dy * dy
        gap = threshold - jnp.sqrt(jnp.maximum(delta_sq, _EPS))
        return jnp.where(delta_sq >= threshold_sq, 0.0,
                         0.5 * weight * gap * gap)

    def grad_pairs(t, v):
        dx = v[dims1[0]] - v[dims2[0]]
        dy = v[dims1[1]] - v[dims2[1]]
        delta_sq = dx * dx + dy * dy
        dist = jnp.sqrt(jnp.maximum(delta_sq, _EPS))
        gap = threshold - dist
        live = (delta_sq >= _EPS) & (delta_sq < threshold_sq)
        ct = jnp.where(live, -weight * gap / dist, 0.0)
        px = ct * dx
        py = ct * dy
        return [(dims1[0], px), (dims1[1], py),
                (dims2[0], -px), (dims2[1], -py)]

    return Cost(name, evaluate, support=tuple(dims1) + tuple(dims2),
                grad_pairs_fn=grad_pairs)


def locally_convex_proximity(weight: float, dims1: Tuple[int, int],
                             dims2: Tuple[int, int], threshold: float,
                             name: str = "locally_convex_proximity") -> Cost:
    """min of axis-aligned convex penalties (keeps Hessian PSD),
    src/locally_convex_proximity_cost.cpp. The shipped gradient omits the
    sgn(dx) factor — replicated verbatim in quad_fn."""
    x1, y1 = dims1
    x2, y2 = dims2
    threshold_sq = threshold * threshold

    def evaluate(t, v):
        dx = v[x1] - v[x2]
        dy = v[y1] - v[y2]
        inactive = (dx * dx >= threshold_sq) | (dy * dy >= threshold_sq)
        delta_x = threshold - jnp.abs(dx)
        delta_y = threshold - jnp.abs(dy)
        val = 0.5 * weight * jnp.minimum(delta_x * delta_x, delta_y * delta_y)
        return jnp.where(inactive, 0.0, val)

    def quad_fn(t, v):
        d = v.shape[0]
        dx = v[x1] - v[x2]
        dy = v[y1] - v[y2]
        inactive = (dx * dx >= threshold_sq) | (dy * dy >= threshold_sq)
        delta_x = threshold - jnp.abs(dx)
        delta_y = threshold - jnp.abs(dy)
        is_x_active = delta_x * delta_x < delta_y * delta_y

        def branch(a_idx, b_idx, delta):
            dval = -weight * delta  # shipped form: no sgn() factor
            grad = assemble_vector(
                d, [(a_idx, dval), (b_idx, -dval)], dval)
            hess = assemble_matrix(
                d,
                [((a_idx, a_idx), weight), ((b_idx, b_idx), weight),
                 ((a_idx, b_idx), -weight), ((b_idx, a_idx), -weight)],
                dval)
            return hess, grad

        hx, gx = branch(x1, x2, delta_x)
        hy, gy = branch(y1, y2, delta_y)
        hess = jnp.where(is_x_active, hx, hy)
        grad = jnp.where(is_x_active, gx, gy)
        zero_h = jnp.zeros_like(hess)
        zero_g = jnp.zeros_like(grad)
        return (jnp.where(inactive, zero_h, hess),
                jnp.where(inactive, zero_g, grad))

    return Cost(name, evaluate, quad_fn)


def weighted_convex_proximity(weight: float, dims1: Tuple[int, int],
                              dims2: Tuple[int, int], vidx1: int, vidx2: int,
                              threshold: float,
                              name: str = "weighted_convex_proximity") -> Cost:
    """Speed-weighted locally convex proximity
    (src/weighted_convex_proximity_cost.cpp); shipped derivatives replicated
    verbatim including their deviations from the true gradient."""
    x1, y1 = dims1
    x2, y2 = dims2
    threshold_sq = threshold * threshold

    def evaluate(t, v):
        dx = v[x1] - v[x2]
        dy = v[y1] - v[y2]
        vv = v[vidx1] * v[vidx1] + v[vidx2] * v[vidx2]
        inactive = (dx * dx >= threshold_sq) | (dy * dy >= threshold_sq)
        delta_x = threshold - jnp.abs(dx)
        delta_y = threshold - jnp.abs(dy)
        val = 0.5 * weight * vv * jnp.minimum(delta_x * delta_x,
                                              delta_y * delta_y)
        return jnp.where(inactive, 0.0, val)

    def quad_fn(t, v):
        d = v.shape[0]
        dx = v[x1] - v[x2]
        dy = v[y1] - v[y2]
        vv = v[vidx1] * v[vidx1] + v[vidx2] * v[vidx2]
        inactive = (dx * dx >= threshold_sq) | (dy * dy >= threshold_sq)
        delta_x = threshold - jnp.abs(dx)
        delta_y = threshold - jnp.abs(dy)
        is_x_active = delta_x * delta_x < delta_y * delta_y

        def branch(a1, a2, delta, diff):
            da1 = -weight * delta * vv
            dv1 = -weight * v[vidx1] * delta * delta
            dv2 = -weight * v[vidx2] * delta * delta
            dda1 = weight
            ddv = weight * delta * delta
            da1dv1 = -2.0 * weight * v[vidx1] * _sgn(diff)
            da1dv2 = -2.0 * weight * v[vidx2] * _sgn(diff)

            hess = assemble_matrix(
                d,
                [((a1, a1), dda1), ((a1, a2), -dda1),
                 ((a2, a1), -dda1), ((a2, a2), dda1),
                 ((a1, vidx1), da1dv1), ((a1, vidx2), da1dv2),
                 ((a2, vidx1), -da1dv1), ((a2, vidx2), -da1dv2),
                 ((vidx1, a1), da1dv1), ((vidx1, a2), -da1dv1),
                 ((vidx1, vidx1), ddv),
                 ((vidx2, a1), da1dv2), ((vidx2, a2), -da1dv2),
                 ((vidx2, vidx2), ddv)],
                da1)
            grad = assemble_vector(
                d,
                [(a1, da1), (a2, -da1), (vidx1, dv1), (vidx2, dv2)], da1)
            return hess, grad

        hx, gx = branch(x1, x2, delta_x, dx)
        hy, gy = branch(y1, y2, delta_y, dy)
        hess = jnp.where(is_x_active, hx, hy)
        grad = jnp.where(is_x_active, gx, gy)
        return (jnp.where(inactive, jnp.zeros_like(hess), hess),
                jnp.where(inactive, jnp.zeros_like(grad), grad))

    return Cost(name, evaluate, quad_fn)


# ---------------------------------------------------------------------------
# Polyline family. All use geometry.polyline_closest_point with the
# reference's branch semantics.
# ---------------------------------------------------------------------------
def quadratic_polyline2(weight: float, points: jnp.ndarray, xidx: int,
                        yidx: int, name: str = "quadratic_polyline2") -> Cost:
    """0.5*w*(signed distance to polyline)^2, zeroed when the closest point
    is a polyline endpoint (src/quadratic_polyline2_cost.cpp)."""
    pts = jnp.asarray(points, jnp.float32)

    def evaluate(t, v):
        # need_sign=False: only |ssd| is consumed, and Pallas gets no DCE.
        res = geometry.polyline_closest_point(
            pts, jnp.array([v[xidx], v[yidx]]), need_sign=False)
        ssd = jnp.where(res.is_endpoint, 0.0, res.signed_sq_distance)
        return 0.5 * weight * jnp.abs(ssd)

    def _scalars(v):
        qx, qy = v[xidx], v[yidx]
        # Sign-free query: gradients/Hessians use only the closest point,
        # segment frame, and vertex/endpoint flags (sign is dead here).
        # Unstacked form: [2]-stacks become lane-minor arrays + cross-lane
        # transposes under the sweep kernel's vmap (geometry.ClosestPointXY).
        res = geometry.polyline_closest_point_xy(pts, qx, qy,
                                                 need_sign=False)

        # Vertex branch: isotropic quadratic pull toward the vertex.
        dxv = weight * (qx - res.cpx)
        dyv = weight * (qy - res.cpy)
        hv = (weight, weight, 0.0)

        # Interior branch: quadratic in the cross-track coordinate.
        ux, uy = res.ux, res.uy
        w_cross = weight * ((qx - res.p1x) * uy - (qy - res.p1y) * ux)
        dxi = w_cross * uy
        dyi = -w_cross * ux
        hi = (weight * uy * uy, weight * ux * ux, -weight * ux * uy)

        use_v = res.is_vertex
        gate = ~res.is_endpoint
        dx = jnp.where(use_v, dxv, dxi) * gate
        dy = jnp.where(use_v, dyv, dyi) * gate
        ddx = jnp.where(use_v, hv[0], hi[0]) * gate
        ddy = jnp.where(use_v, hv[1], hi[1]) * gate
        dxdy = jnp.where(use_v, hv[2], hi[2]) * gate
        return dx, dy, ddx, ddy, dxdy

    def grad_pairs(t, v):
        dx, dy, _, _, _ = _scalars(v)
        return [(xidx, dx), (yidx, dy)]

    def quad_pairs(t, v):
        dx, dy, ddx, ddy, dxdy = _scalars(v)
        return ([((xidx, xidx), ddx), ((yidx, yidx), ddy),
                 ((xidx, yidx), dxdy), ((yidx, xidx), dxdy)],
                [(xidx, dx), (yidx, dy)])

    def quad_fn(t, v):
        d = v.shape[0]
        dx, dy, ddx, ddy, dxdy = _scalars(v)
        grad = assemble_vector(d, [(xidx, dx), (yidx, dy)], dx)
        hess = assemble_matrix(
            d,
            [((xidx, xidx), ddx), ((yidx, yidx), ddy),
             ((xidx, yidx), dxdy), ((yidx, xidx), dxdy)], dx)
        return hess, grad

    return Cost(name, evaluate, quad_fn, grad_pairs_fn=grad_pairs,
                quad_pairs_fn=quad_pairs)


def semiquadratic_polyline2(weight: float, points: jnp.ndarray, xidx: int,
                            yidx: int, threshold: float, oriented_right: bool,
                            name: str = "semiquadratic_polyline2") -> Cost:
    """One-sided lane-boundary cost on signed distance past a threshold
    (src/semiquadratic_polyline2_cost.cpp)."""
    pts = jnp.asarray(points, jnp.float32)
    signed_sq_threshold = (1.0 if threshold >= 0 else -1.0) * threshold * threshold

    def _active(ssd):
        if oriented_right:
            return ssd > signed_sq_threshold
        return ssd < signed_sq_threshold

    def evaluate(t, v):
        res = geometry.polyline_closest_point(pts, jnp.array([v[xidx], v[yidx]]))
        ssd = res.signed_sq_distance
        sd = _sgn(ssd) * jnp.sqrt(jnp.maximum(jnp.abs(ssd), _EPS))
        diff = sd - threshold
        val = 0.5 * weight * diff * diff
        return jnp.where(res.is_endpoint | ~_active(ssd), 0.0, val)

    def _scalars(v):
        qx, qy = v[xidx], v[yidx]
        # Unstacked query (geometry.ClosestPointXY rationale).
        res = geometry.polyline_closest_point_xy(pts, qx, qy)
        ssd = res.signed_sq_distance
        gate = _active(ssd) & ~res.is_endpoint

        dist = jnp.sqrt(jnp.maximum(jnp.abs(ssd), _EPS))
        scaling = (dist - jnp.abs(threshold)) / dist
        dxv = weight * scaling * (qx - res.cpx)
        dyv = weight * scaling * (qy - res.cpy)

        ux, uy = res.ux, res.uy
        # Componentwise scalar selects (no jnp.array constants: Mosaic
        # kernels cannot capture array consts — ops/pallas/sweep.py).
        hess_iv = (
            jnp.where(res.is_vertex, weight, weight * uy * uy),
            jnp.where(res.is_vertex, weight, weight * ux * ux),
            jnp.where(res.is_vertex, 0.0, -weight * ux * uy),
        )
        # Interior branch replaces the gradient with the cross-track form
        # (src/semiquadratic_polyline2_cost.cpp:126-135).
        w_cross = weight * (
            (qx - res.p1x) * uy - (qy - res.p1y) * ux - threshold)
        dxi = w_cross * uy
        dyi = -w_cross * ux
        dx = jnp.where(res.is_vertex, dxv, dxi) * gate
        dy = jnp.where(res.is_vertex, dyv, dyi) * gate
        ddx = hess_iv[0] * gate
        ddy = hess_iv[1] * gate
        dxdy = hess_iv[2] * gate
        return dx, dy, ddx, ddy, dxdy

    def grad_pairs(t, v):
        dx, dy, _, _, _ = _scalars(v)
        return [(xidx, dx), (yidx, dy)]

    def quad_pairs(t, v):
        dx, dy, ddx, ddy, dxdy = _scalars(v)
        return ([((xidx, xidx), ddx), ((yidx, yidx), ddy),
                 ((xidx, yidx), dxdy), ((yidx, xidx), dxdy)],
                [(xidx, dx), (yidx, dy)])

    def quad_fn(t, v):
        d = v.shape[0]
        dx, dy, ddx, ddy, dxdy = _scalars(v)
        grad = assemble_vector(d, [(xidx, dx), (yidx, dy)], dx)
        hess = assemble_matrix(
            d,
            [((xidx, xidx), ddx), ((yidx, yidx), ddy),
             ((xidx, yidx), dxdy), ((yidx, xidx), dxdy)], dx)
        return hess, grad

    return Cost(name, evaluate, quad_fn, grad_pairs_fn=grad_pairs,
                quad_pairs_fn=quad_pairs)


def polyline2_signed_distance(points: jnp.ndarray, xidx: int, yidx: int,
                              nominal: float = 0.0,
                              oriented_same_as_polyline: bool = True,
                              name: str = "polyline2_signed_distance") -> Cost:
    """signed_distance(p, polyline) - nominal, with optional sign flip
    (src/polyline2_signed_distance_cost.cpp). The shipped interior-branch
    gradient ignores the orientation flip — replicated."""
    pts = jnp.asarray(points, jnp.float32)
    flip = 1.0 if oriented_same_as_polyline else -1.0

    def evaluate(t, v):
        res = geometry.polyline_closest_point(pts, jnp.array([v[xidx], v[yidx]]))
        ssd = res.signed_sq_distance * flip
        return _sgn(ssd) * jnp.sqrt(jnp.maximum(jnp.abs(ssd), _EPS)) - nominal

    def _scalars(v):
        qx, qy = v[xidx], v[yidx]
        # Unstacked query (geometry.ClosestPointXY rationale).
        res = geometry.polyline_closest_point_xy(pts, qx, qy)
        ssd = res.signed_sq_distance * flip
        s = _sgn(ssd)
        dist = jnp.sqrt(jnp.maximum(jnp.abs(ssd), _EPS))
        delta_x = qx - res.cpx
        delta_y = qy - res.cpy
        denom = jnp.where(jnp.abs(ssd * dist) < _EPS, _EPS, ssd * dist)

        # Vertex branch: true derivatives of s*distance.
        dxv = s * delta_x / dist
        dyv = s * delta_y / dist
        ddxv = delta_y * delta_y / denom
        ddyv = delta_x * delta_x / denom
        dxdyv = -delta_x * delta_y / denom

        # Interior branch (shipped: orientation flip NOT applied here).
        ux, uy = res.ux, res.uy
        dx = jnp.where(res.is_vertex, dxv, uy)
        dy = jnp.where(res.is_vertex, dyv, -ux)
        ddx = jnp.where(res.is_vertex, ddxv, 0.0)
        ddy = jnp.where(res.is_vertex, ddyv, 0.0)
        dxdy = jnp.where(res.is_vertex, dxdyv, 0.0)
        return dx, dy, ddx, ddy, dxdy

    def quad_fn(t, v):
        d = v.shape[0]
        dx, dy, ddx, ddy, dxdy = _scalars(v)
        grad = assemble_vector(d, [(xidx, dx), (yidx, dy)], dx)
        hess = assemble_matrix(
            d,
            [((xidx, xidx), ddx), ((yidx, yidx), ddy),
             ((xidx, yidx), dxdy), ((yidx, xidx), dxdy)], dx)
        return hess, grad

    def quad_pairs(t, v):
        dx, dy, ddx, ddy, dxdy = _scalars(v)
        return ([((xidx, xidx), ddx), ((yidx, yidx), ddy),
                 ((xidx, yidx), dxdy), ((yidx, xidx), dxdy)],
                [(xidx, dx), (yidx, dy)])

    def grad_pairs(t, v):
        # quad_fn's gradient scalars without the Hessian work (the merit
        # path's dead Hessian costs a d^2 stack inside the sweep kernel,
        # which gets no DCE).
        qx, qy = v[xidx], v[yidx]
        res = geometry.polyline_closest_point_xy(pts, qx, qy)
        ssd = res.signed_sq_distance * flip
        s = _sgn(ssd)
        dist = jnp.sqrt(jnp.maximum(jnp.abs(ssd), _EPS))
        dxv = s * (qx - res.cpx) / dist
        dyv = s * (qy - res.cpy) / dist
        ux, uy = res.ux, res.uy
        dx = jnp.where(res.is_vertex, dxv, uy)
        dy = jnp.where(res.is_vertex, dyv, -ux)
        return [(xidx, dx), (yidx, dy)]

    return Cost(name, evaluate, quad_fn, grad_pairs_fn=grad_pairs,
                quad_pairs_fn=quad_pairs)


def route_progress(weight: float, points: jnp.ndarray, xidx: int, yidx: int,
                   nominal_speed: float, initial_route_pos: float = 0.0,
                   name: str = "route_progress") -> Cost:
    """Quadratic pull toward the point `initial_route_pos + t*v_nom` along
    the polyline (src/route_progress_cost.cpp). The desired point depends
    only on time, so autodiff gives the shipped derivatives."""
    pts = jnp.asarray(points, jnp.float32)

    def evaluate(t, v):
        desired = geometry.polyline_point_at(
            pts, initial_route_pos + t * nominal_speed
        )
        desired = jax.lax.stop_gradient(desired)
        dx = v[xidx] - desired[0]
        dy = v[yidx] - desired[1]
        return 0.5 * weight * (dx * dx + dy * dy)

    return Cost(name, evaluate, support=(xidx, yidx))


# ---------------------------------------------------------------------------
# Scalar state costs.
# ---------------------------------------------------------------------------
def nominal_path_length(weight: float, dim: int, nominal_speed: float,
                        name: str = "nominal_path_length") -> Cost:
    """0.5*w*(v[dim] - t*v_nom)^2 (src/nominal_path_length_cost.cpp)."""

    def evaluate(t, v):
        delta = v[dim] - t * nominal_speed
        return 0.5 * weight * delta * delta

    def grad_pairs(t, v):
        return [(dim, weight * (v[dim] - t * nominal_speed))]

    return Cost(name, evaluate, support=(dim,), grad_pairs_fn=grad_pairs)


def curvature(weight: float, omega_idx: int, v_idx: int,
              name: str = "curvature") -> Cost:
    """0.5*w*(omega/v)^2 (src/curvature_cost.cpp); true derivatives."""

    def evaluate(t, v):
        c = v[omega_idx] / v[v_idx]
        return 0.5 * weight * c * c

    return Cost(name, evaluate, support=(omega_idx, v_idx))


def orientation(weight: float, dim: int, nominal: float,
                name: str = "orientation") -> Cost:
    """0.5*w*wrap(theta - nominal)^2 with C-style fmod wrapping
    (src/orientation_cost.cpp)."""

    def evaluate(t, v):
        angle_diff = jnp.fmod(v[dim] - nominal + jnp.pi, 2.0 * jnp.pi) - jnp.pi
        return 0.5 * weight * angle_diff * angle_diff

    return Cost(name, evaluate, support=(dim,))


# ---------------------------------------------------------------------------
# Combinators.
# ---------------------------------------------------------------------------
def final_time(inner: Cost, threshold_time: float,
               name: str = "final_time") -> Cost:
    """Applies `inner` only at relative times >= threshold_time
    (cost/final_time_cost.h:54-83)."""

    def evaluate(t, v):
        return jnp.where(t >= threshold_time, inner.evaluate(t, v), 0.0)

    def quad_fn(t, v):
        hess, grad = inner.quadraticize(t, v)
        gate = jnp.asarray(t >= threshold_time, hess.dtype)
        return hess * gate, grad * gate

    def grad_pairs(t, v):
        pairs = inner.gradient_pairs(t, v)
        if pairs is None:
            return None
        gate = jnp.asarray(t >= threshold_time, jnp.float32)
        return [(i, s * gate) for i, s in pairs]

    def quad_pairs(t, v):
        qp = inner.quad_pairs(t, v)
        if qp is None:
            return None
        hp, gp = qp
        gate = jnp.asarray(t >= threshold_time, jnp.float32)
        return ([(ij, h * gate) for ij, h in hp],
                [(i, s * gate) for i, s in gp])

    return Cost(name, evaluate, quad_fn, grad_pairs_fn=grad_pairs,
                quad_pairs_fn=quad_pairs)


def extreme_value(costs: Sequence[Cost], is_min: bool,
                  name: str = "extreme_value") -> Cost:
    """min/max over a set of costs; quadraticizes the active one with
    first-wins tie-breaking (src/extreme_value_cost.cpp)."""
    costs = tuple(costs)

    def _values(t, v):
        return jnp.stack([c.evaluate(t, v) for c in costs])

    def _active_index(vals):
        return jnp.argmin(vals) if is_min else jnp.argmax(vals)

    def evaluate(t, v):
        vals = _values(t, v)
        return vals[jax.lax.stop_gradient(_active_index(vals))]

    def quad_fn(t, v):
        vals = jax.lax.stop_gradient(_values(t, v))
        idx = _active_index(vals)
        hs, gs = zip(*[c.quadraticize(t, v) for c in costs])
        onehot = jax.nn.one_hot(idx, len(costs), dtype=v.dtype)
        hess = jnp.einsum("c,cij->ij", onehot, jnp.stack(hs))
        grad = jnp.einsum("c,ci->i", onehot, jnp.stack(gs))
        return hess, grad

    def grad_pairs(t, v):
        # Sparse form of quad_fn's gradient: every member's pairs, each
        # gated by its one-hot activity scalar (duplicate dims accumulate
        # in assemble_vector, preserving the member order of the einsum).
        vals = jax.lax.stop_gradient(_values(t, v))
        idx = _active_index(vals)
        pairs = []
        for ci, c in enumerate(costs):
            pp = c.gradient_pairs(t, v)
            if pp is None:
                return None  # dense member -> fall back to quad_fn
            gate = (idx == ci).astype(jnp.float32)
            pairs.extend((dim, g * gate) for dim, g in pp)
        return pairs

    def quad_pairs(t, v):
        vals = jax.lax.stop_gradient(_values(t, v))
        idx = _active_index(vals)
        hpairs, gpairs = [], []
        for ci, c in enumerate(costs):
            qp = c.quad_pairs(t, v)
            if qp is None:
                return None  # dense member -> fall back to quad_fn
            hp, gp = qp
            gate = (idx == ci).astype(jnp.float32)
            hpairs.extend((ij, h * gate) for ij, h in hp)
            gpairs.extend((dim, g * gate) for dim, g in gp)
        return hpairs, gpairs

    return Cost(name, evaluate, quad_fn, grad_pairs_fn=grad_pairs,
                quad_pairs_fn=quad_pairs)
