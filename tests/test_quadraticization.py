"""Finite-difference validation of every cost/constraint quadraticization,
mirroring test/test_quadraticization.cpp: central-difference gradient of
Evaluate and Hessian of the (analytic) gradient, at random inputs, with
the reference's tolerances (kNumericalPrecision = 0.15 absolute / 0.1
fractional, test_quadraticization.cpp:86-88).

Costs whose shipped derivatives intentionally deviate from the true ones
(the convex-proximity family) are checked for self-consistency of their
quad_fn (gradient FD of nothing), exactly as the reference test does —
it validates the *shipped* derivative against FD of the *shipped* cost,
which passes because the deviation only appears off the evaluation branch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ilqgames_tpu import geometry
from ilqgames_tpu.costs import atoms, constraints
from ilqgames_tpu.types import DEFAULT_MU

DIM = 8
T = 1.3
TOL = 0.15
FRAC = 0.1
STEP = 1e-3
N_RANDOM = 10

POLY = np.array([[-2.0, -2.0], [0.5, -1.0], [1.0, 2.0], [3.0, 2.5]], np.float32)


def fd_grad(f, v, step=STEP):
    g = np.zeros_like(v)
    for i in range(v.size):
        vp, vm = v.copy(), v.copy()
        vp[i] += step
        vm[i] -= step
        g[i] = (f(vp) - f(vm)) / (2 * step)
    return g


def fd_hess_of_grad(grad_fn, v, step=STEP):
    h = np.zeros((v.size, v.size), np.float32)
    for i in range(v.size):
        vp, vm = v.copy(), v.copy()
        vp[i] += step
        vm[i] -= step
        h[:, i] = (grad_fn(vp) - grad_fn(vm)) / (2 * step)
    return h


def close(a, b):
    a, b = np.asarray(a), np.asarray(b)
    denom = np.maximum(np.abs(a), np.abs(b))
    ok = np.abs(a - b) <= np.maximum(TOL, FRAC * denom)
    return ok.all()


def check_cost(cost, dim=DIM, seed=0):
    rng = np.random.RandomState(seed)
    quad = jax.jit(lambda v: cost.quadraticize(T, v))
    ev = jax.jit(lambda v: cost.evaluate(T, v))
    for _ in range(N_RANDOM):
        v = rng.randn(dim).astype(np.float32) * 2.0
        hess, grad = quad(jnp.asarray(v))
        g_fd = fd_grad(lambda vv: float(ev(jnp.asarray(vv))), v)
        assert close(grad, g_fd), f"{cost.name}: grad mismatch at {v}"
        h_fd = fd_hess_of_grad(
            lambda vv: np.asarray(quad(jnp.asarray(vv))[1]), v
        )
        assert close(hess, h_fd), f"{cost.name}: hess mismatch at {v}"


def check_constraint(con, dim=DIM, seed=0, lam=0.7, mu=DEFAULT_MU):
    rng = np.random.RandomState(seed)
    quad = jax.jit(lambda v: con.quadraticize_al(T, v, lam, mu))
    ev = jax.jit(lambda v: con.evaluate_al(T, v, lam, mu))
    for _ in range(N_RANDOM):
        v = rng.randn(dim).astype(np.float32) * 2.0
        hess, grad = quad(jnp.asarray(v))
        g_fd = fd_grad(lambda vv: float(ev(jnp.asarray(vv))), v)
        assert close(grad, g_fd), f"{con.name}: grad mismatch at {v}"
        h_fd = fd_hess_of_grad(
            lambda vv: np.asarray(quad(jnp.asarray(vv))[1]), v
        )
        assert close(hess, h_fd), f"{con.name}: hess mismatch at {v}"


# --------------------------- costs ---------------------------
def test_quadratic():
    check_cost(atoms.quadratic(3.0, 2, 1.0))
    check_cost(atoms.quadratic(3.0, None, -0.5))


def test_semiquadratic():
    check_cost(atoms.semiquadratic(2.0, 1, 0.5, True))
    check_cost(atoms.semiquadratic(2.0, 1, 0.5, False))


def test_quadratic_norm():
    check_cost(atoms.quadratic_norm(2.0, 0, 1, 1.5))


def test_semiquadratic_norm():
    check_cost(atoms.semiquadratic_norm(2.0, 0, 1, 1.0, True))
    check_cost(atoms.semiquadratic_norm(2.0, 0, 1, 1.0, False))


def test_quadratic_difference():
    check_cost(atoms.quadratic_difference(2.0, (0, 1), (2, 3)))


def test_relative_distance():
    check_cost(atoms.relative_distance(2.0, (0, 1), (2, 3)))


def test_signed_distance():
    check_cost(atoms.signed_distance((0, 1), (2, 3), nominal=1.0))


def test_proximity():
    check_cost(atoms.proximity(5.0, (0, 1), (2, 3), threshold=3.0))


def check_shipped_cost(cost, dim=DIM, seed=0, positive_diff_dims=()):
    """For costs whose SHIPPED gradient deviates from the true one on some
    branches (the convex-proximity family omits sgn(dx) factors,
    src/locally_convex_proximity_cost.cpp:89-95): always check Hessian ==
    FD of the shipped gradient (self-consistency is what the solver needs),
    and check gradient == FD of Evaluate only where shipped == truth
    (dx > 0, dy > 0)."""
    rng = np.random.RandomState(seed)
    quad = jax.jit(lambda v: cost.quadraticize(T, v))
    ev = jax.jit(lambda v: cost.evaluate(T, v))
    for _ in range(N_RANDOM):
        v = rng.randn(dim).astype(np.float32) * 2.0
        for a, b in positive_diff_dims:
            v[a] = v[b] + abs(v[a] - v[b])  # force positive difference
        hess, grad = quad(jnp.asarray(v))
        g_fd = fd_grad(lambda vv: float(ev(jnp.asarray(vv))), v)
        assert close(grad, g_fd), f"{cost.name}: grad mismatch at {v}"
        h_fd = fd_hess_of_grad(
            lambda vv: np.asarray(quad(jnp.asarray(vv))[1]), v
        )
        assert close(hess, h_fd), f"{cost.name}: hess mismatch at {v}"


def test_locally_convex_proximity():
    check_shipped_cost(
        atoms.locally_convex_proximity(5.0, (0, 1), (2, 3), 3.0),
        positive_diff_dims=((0, 2), (1, 3)),
    )


def test_weighted_convex_proximity():
    """The reference's shipped derivatives for this cost deviate from the
    truth beyond sign conventions (dv1 = -w*v1*delta^2 where the true
    gradient is +w*v1*delta^2, and the cross terms drop a delta factor --
    src/weighted_convex_proximity_cost.cpp:90-97). We replicate the shipped
    formulas verbatim, so the oracle here is a NumPy transcription of those
    formulas, not finite differences."""
    w, T = 5.0, 3.0
    cost = atoms.weighted_convex_proximity(w, (0, 1), (2, 3), 4, 5, T)
    rng = np.random.RandomState(3)
    quad = jax.jit(lambda v: cost.quadraticize(T=1.0, v=v) if False else cost.quadraticize(1.0, v))
    for _ in range(N_RANDOM):
        v = rng.randn(DIM).astype(np.float32) * 2.0
        hess, grad = cost.quadraticize(1.0, jnp.asarray(v))
        dx, dy = v[0] - v[2], v[1] - v[3]
        vv = v[4] ** 2 + v[5] ** 2
        g_ref = np.zeros(DIM, np.float32)
        h_ref = np.zeros((DIM, DIM), np.float32)
        if not (dx * dx >= T * T or dy * dy >= T * T):
            delta_x, delta_y = T - abs(dx), T - abs(dy)
            if delta_x**2 < delta_y**2:
                a1, a2, delta, diff = 0, 2, delta_x, dx
            else:
                a1, a2, delta, diff = 1, 3, delta_y, dy
            d1 = -w * delta * vv
            dv1, dv2 = -w * v[4] * delta**2, -w * v[5] * delta**2
            g_ref[a1] += d1
            g_ref[a2] -= d1
            g_ref[4] += dv1
            g_ref[5] += dv2
            dd1, ddv = w, w * delta**2
            c1 = -2.0 * w * v[4] * np.sign(diff)
            c2 = -2.0 * w * v[5] * np.sign(diff)
            h_ref[a1, a1] += dd1; h_ref[a1, a2] -= dd1
            h_ref[a2, a1] -= dd1; h_ref[a2, a2] += dd1
            h_ref[a1, 4] += c1; h_ref[a1, 5] += c2
            h_ref[a2, 4] -= c1; h_ref[a2, 5] -= c2
            h_ref[4, a1] += c1; h_ref[4, a2] -= c1; h_ref[4, 4] += ddv
            h_ref[5, a1] += c2; h_ref[5, a2] -= c2; h_ref[5, 5] += ddv
        np.testing.assert_allclose(np.asarray(grad), g_ref, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(hess), h_ref, rtol=1e-5, atol=1e-5)


def test_quadratic_polyline2():
    check_cost(atoms.quadratic_polyline2(2.0, POLY, 0, 1))


def test_semiquadratic_polyline2():
    """Interior branch only: the shipped vertex-branch Hessian is w*I,
    which ignores the scaling term's derivative (another shipped
    deviation, src/semiquadratic_polyline2_cost.cpp:106-115); the
    reference's FD test never samples that branch."""

    def interior_only(cost, seed):
        rng = np.random.RandomState(seed)
        quad = jax.jit(lambda v: cost.quadraticize(T, v))
        ev = jax.jit(lambda v: cost.evaluate(T, v))
        checked = 0
        while checked < N_RANDOM:
            v = rng.randn(DIM).astype(np.float32) * 2.0
            res = geometry.polyline_closest_point(
                jnp.asarray(POLY), jnp.array([v[0], v[1]])
            )
            if bool(res.is_vertex):
                continue
            checked += 1
            hess, grad = quad(jnp.asarray(v))
            g_fd = fd_grad(lambda vv: float(ev(jnp.asarray(vv))), v)
            assert close(grad, g_fd), f"{cost.name}: grad mismatch at {v}"
            h_fd = fd_hess_of_grad(
                lambda vv: np.asarray(quad(jnp.asarray(vv))[1]), v
            )
            assert close(hess, h_fd), f"{cost.name}: hess mismatch at {v}"

    interior_only(atoms.semiquadratic_polyline2(2.0, POLY, 0, 1, 0.5, True), 0)
    interior_only(atoms.semiquadratic_polyline2(2.0, POLY, 0, 1, -0.5, False), 1)


def test_polyline2_signed_distance_cost():
    check_cost(atoms.polyline2_signed_distance(POLY, 0, 1, nominal=0.5))


def test_route_progress():
    check_cost(
        atoms.route_progress(2.0, POLY, 0, 1, nominal_speed=1.0)
    )


def test_nominal_path_length():
    check_cost(atoms.nominal_path_length(2.0, 3, 1.5))


def test_curvature():
    check_cost(atoms.curvature(2.0, 0, 4))


def test_orientation():
    check_cost(atoms.orientation(2.0, 2, 0.7))


def test_final_time():
    inner = atoms.quadratic(3.0, 1, 0.0)
    check_cost(atoms.final_time(inner, threshold_time=0.5))  # active at T=1.3
    check_cost(atoms.final_time(inner, threshold_time=5.0))  # inactive


def test_extreme_value():
    c1 = atoms.quadratic(1.0, 0, 0.0)
    c2 = atoms.quadratic(2.0, 1, 1.0)
    check_cost(atoms.extreme_value((c1, c2), is_min=True))
    check_cost(atoms.extreme_value((c1, c2), is_min=False))


# --------------------------- constraints ---------------------------
def test_single_dimension_constraint():
    check_constraint(constraints.single_dimension(2, 0.5, True))
    check_constraint(constraints.single_dimension(2, 0.5, False))


def test_affine_scalar_constraint():
    a = np.arange(1, DIM + 1, dtype=np.float32) / DIM
    check_constraint(constraints.affine_scalar(a, 0.3, is_equality=True))
    check_constraint(constraints.affine_scalar(a, 0.3, is_equality=False))


def test_proximity_constraint():
    check_constraint(
        constraints.proximity((0, 1), (2, 3), 2.0, keep_within=False)
    )
    check_constraint(
        constraints.proximity((0, 1), (2, 3), 2.0, keep_within=True)
    )


def test_polyline2_signed_distance_constraint():
    check_constraint(
        constraints.polyline2_signed_distance(POLY, 0, 1, 0.5, True)
    )
    check_constraint(
        constraints.polyline2_signed_distance(POLY, 0, 1, 0.5, False)
    )
