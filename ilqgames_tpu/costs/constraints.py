"""Concrete constraint library (6 types) for the augmented-Lagrangian solver.

Each builder returns a `Constraint` with a pure g(t_rel, v). The AL
quadraticization defaults to autodiff of lambda*g + mu_eff*g^2/2, which
reproduces the reference's ModifyDerivatives algebra; AffineVectorConstraint
overrides it to replicate the shipped Hessian verbatim (which uses A A^T
where the true derivative has A^T A — include/ilqgames/constraint/
affine_vector_constraint.h:95-99).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ilqgames_tpu import geometry
from ilqgames_tpu.costs.base import Constraint

_EPS = 1e-12


def _mu_eff_ineq(gval, lam, mu):
    """Inequality effective mu (constraint/constraint.h:112-117): mu
    switches off for satisfied, inactive constraints."""
    from ilqgames_tpu.types import SMALL_NUMBER

    inactive = (gval <= SMALL_NUMBER) & (jnp.abs(lam) <= SMALL_NUMBER)
    return jnp.where(inactive, 0.0, mu)


def single_dimension(dim: int, threshold: float, keep_below: bool,
                     name: str = "single_dimension") -> Constraint:
    """g = x[dim]-threshold (keep_below) or threshold-x[dim]
    (constraint/single_dimension_constraint.h:57-104)."""

    def g(t, v):
        return v[dim] - threshold if keep_below else threshold - v[dim]

    def al_grad_pairs(t, v, lam, mu):
        gval = g(t, v)
        ct = lam + _mu_eff_ineq(gval, lam, mu) * gval
        return [(dim, ct if keep_below else -ct)]

    def al_quad_pairs(t, v, lam, mu):
        # g is affine: hess = mu_eff * dg dg^T = mu_eff at (dim, dim).
        gval = g(t, v)
        mu_eff = _mu_eff_ineq(gval, lam, mu)
        ct = lam + mu_eff * gval
        return ([((dim, dim), mu_eff)],
                [(dim, ct if keep_below else -ct)])

    return Constraint(name, g, is_equality=False, support=(dim,),
                      al_grad_pairs_fn=al_grad_pairs,
                      al_quad_pairs_fn=al_quad_pairs)


def affine_scalar(a, b: float, is_equality: bool,
                  name: str = "affine_scalar") -> Constraint:
    """g = a^T v - b (constraint/affine_scalar_constraint.h)."""
    a = jnp.asarray(a, jnp.float32)

    def g(t, v):
        return jnp.dot(a, v) - b

    return Constraint(name, g, is_equality=is_equality)


def affine_vector(A, b, is_equality: bool,
                  name: str = "affine_vector") -> Constraint:
    """g = ||A v - b|| (constraint/affine_vector_constraint.h). The shipped
    Hessian's lambda-term uses A A^T in place of A^T A; replicated."""
    A = jnp.asarray(A, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    ATA = A.T @ A
    AAT = A @ A.T

    def g(t, v):
        d = A @ v - b
        return jnp.sqrt(jnp.maximum(jnp.sum(d * d), _EPS))

    def quad_fn(t, v, lam, mu):
        from ilqgames_tpu.types import SMALL_NUMBER

        delta = A @ v - b
        value = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta), _EPS))
        if is_equality:
            mu_eff = mu
        else:
            inactive = (value <= SMALL_NUMBER) & (jnp.abs(lam) <= SMALL_NUMBER)
            mu_eff = jnp.where(inactive, 0.0, mu)
        AT_delta = A.T @ delta
        grad = (mu_eff + lam / value) * AT_delta
        hess = (lam / value) * (
            AAT - jnp.outer(AT_delta, AT_delta) / (value * value)
        ) + mu_eff * ATA
        return hess, grad

    return Constraint(name, g, is_equality=is_equality, quad_fn=quad_fn)


def proximity(dims1: Tuple[int, int], dims2: Tuple[int, int], threshold: float,
              keep_within: bool, name: str = "proximity_constraint") -> Constraint:
    """g = +/-(||p1 - p2|| - threshold) (src/proximity_constraint.cpp)."""
    s = 1.0 if keep_within else -1.0

    def g(t, v):
        dx = v[dims1[0]] - v[dims2[0]]
        dy = v[dims1[1]] - v[dims2[1]]
        prox = jnp.sqrt(jnp.maximum(dx * dx + dy * dy, _EPS))
        return s * (prox - threshold)

    def al_grad_pairs(t, v, lam, mu):
        """(lam + mu_eff*g) * dg with dg = s*(dx, dy, -dx, -dy)/prox —
        the analytic form of autodiff through evaluate_al (the ~170-eqn
        restricted-autodiff trace was the sweep kernel's biggest single
        cost; this is ~20)."""
        dx = v[dims1[0]] - v[dims2[0]]
        dy = v[dims1[1]] - v[dims2[1]]
        ssq = dx * dx + dy * dy
        prox = jnp.sqrt(jnp.maximum(ssq, _EPS))
        gval = s * (prox - threshold)
        # Autodiff's maximum() rule zeroes the gradient when the clamp
        # is active (ssq < _EPS) — replicated.
        live = (ssq >= _EPS).astype(jnp.float32)
        ct = (lam + _mu_eff_ineq(gval, lam, mu)
              * gval) * s * live / prox
        px = ct * dx
        py = ct * dy
        return [(dims1[0], px), (dims1[1], py),
                (dims2[0], -px), (dims2[1], -py)]

    def al_quad_pairs(t, v, lam, mu):
        """Analytic AL quadraticization (reference ModifyDerivatives
        algebra, src/constraint.cpp:62-89, on the proximity derivatives
        of src/proximity_constraint.cpp:45-117):
          grad = (lam + mu_eff*g) * dg
          hess = mu_eff * dg dg^T + (lam + mu_eff*g) * d2g
        with dg = s*(dx, dy, -dx, -dy)/prox and d2g the radial-distance
        Hessian s*(I - n n^T)/prox. The autodiff fallback traced a
        4-dim jax.hessian of evaluate_al INSIDE the Pallas stage kernel,
        whose tangent bookkeeping OOM-killed the Mosaic compile helper
        (tools/tpu_stage_check.txt stage_kernel_qstate)."""
        x1, y1 = dims1
        x2, y2 = dims2
        dx = v[x1] - v[x2]
        dy = v[y1] - v[y2]
        ssq = dx * dx + dy * dy
        prox = jnp.sqrt(jnp.maximum(ssq, _EPS))
        gval = s * (prox - threshold)
        live = (ssq >= _EPS).astype(jnp.float32)
        mu_eff = _mu_eff_ineq(gval, lam, mu)
        lam_t = lam + mu_eff * gval
        inv = 1.0 / prox
        gx = s * dx * inv
        gy = s * dy * inv
        # Gradient pairs (same scalars as al_grad_pairs).
        ct = lam_t * live
        px = ct * gx
        py = ct * gy
        gp = [(x1, px), (y1, py), (x2, -px), (y2, -py)]
        # Hessian in the (dx, dy) difference coordinates.
        nx = dx * inv
        ny = dy * inv
        hxx = (mu_eff * gx * gx + lam_t * s * (ny * ny) * inv) * live
        hyy = (mu_eff * gy * gy + lam_t * s * (nx * nx) * inv) * live
        hxy = (mu_eff * gx * gy - lam_t * s * (nx * ny) * inv) * live
        hp = [
            ((x1, x1), hxx), ((y1, y1), hyy),
            ((x1, y1), hxy), ((y1, x1), hxy),
            ((x2, x2), hxx), ((y2, y2), hyy),
            ((x2, y2), hxy), ((y2, x2), hxy),
            ((x1, x2), -hxx), ((x2, x1), -hxx),
            ((y1, y2), -hyy), ((y2, y1), -hyy),
            ((x1, y2), -hxy), ((y2, x1), -hxy),
            ((y1, x2), -hxy), ((x2, y1), -hxy),
        ]
        return hp, gp

    return Constraint(name, g, is_equality=False,
                      support=tuple(dims1) + tuple(dims2),
                      al_grad_pairs_fn=al_grad_pairs,
                      al_quad_pairs_fn=al_quad_pairs)


def polyline2_signed_distance(points, xidx: int, yidx: int, threshold: float,
                              keep_left: bool,
                              name: str = "polyline2_sd_constraint") -> Constraint:
    """g = +/-(signed_distance(p, polyline) - threshold)
    (src/polyline2_signed_distance_constraint.cpp). Autodiff through
    geometry.signed_distance reproduces the shipped interior (affine) and
    vertex (radial) derivative branches."""
    pts = jnp.asarray(points, jnp.float32)
    s = 1.0 if keep_left else -1.0

    def g(t, v):
        sd = geometry.signed_distance(pts, jnp.array([v[xidx], v[yidx]]))
        return s * (sd - threshold)

    return Constraint(name, g, is_equality=False)


def final_time(inner: Constraint, threshold_time: float,
               name: str = "final_time_constraint") -> Constraint:
    """Active only at relative times >= threshold_time
    (constraint/final_time_constraint.h:55-80)."""

    def g(t, v):
        return jnp.where(t < threshold_time, 0.0, inner.g(t, v))

    def quad_fn(t, v, lam, mu):
        hess, grad = inner.quadraticize_al(t, v, lam, mu)
        gate = (t >= threshold_time).astype(hess.dtype)
        return hess * gate, grad * gate

    def al_grad_pairs(t, v, lam, mu):
        pairs = inner.gradient_al_pairs(t, v, lam, mu)
        if pairs is None:
            return None
        gate = (t >= threshold_time).astype(jnp.float32)
        return [(i, s * gate) for i, s in pairs]

    def al_quad_pairs(t, v, lam, mu):
        qp = inner.quad_al_pairs(t, v, lam, mu)
        if qp is None:
            return None
        hp, gp = qp
        gate = (t >= threshold_time).astype(jnp.float32)
        return ([(ij, h * gate) for ij, h in hp],
                [(i, s * gate) for i, s in gp])

    return Constraint(name, g, is_equality=inner.is_equality, quad_fn=quad_fn,
                      al_grad_pairs_fn=al_grad_pairs,
                      al_quad_pairs_fn=al_quad_pairs)
