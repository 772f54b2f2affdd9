"""Numerical Jacobians vs autodiff linearization for every dynamics model,
mirroring test/test_linearization.cpp (forward step 1e-3, tol 1e-2,
:63-64). Here the analytic A, B come from jax.jacfwd, so this validates
the autodiff plumbing, padding, and the discrete A = I + dt*J convention."""

import numpy as np
import jax.numpy as jnp
import pytest

from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.dynamics import flat, models
from ilqgames_tpu.types import OperatingPoint

DT = 0.1
STEP = 1e-3
TOL = 1e-2


def multi(m):
    return dyn_base.concatenate(m.name, [m])


CASES = [
    multi(models.point_mass_2d()),
    multi(models.dubins_car(1.5)),
    multi(models.delayed_dubins_car(1.5)),
    multi(models.unicycle_4d()),
    multi(models.unicycle_5d()),
    multi(models.car_5d(4.0)),
    multi(models.car_6d(4.0)),
    multi(models.car_7d(4.0)),
    models.two_player_unicycle_4d(),
    models.air_3d(1.0, 1.2),
    dyn_base.concatenate(
        "car6d_unicycle4d", [models.car_6d(4.0), models.unicycle_4d()]
    ),
    flat.concatenate_flat(
        "flat_car_unicycle", [flat.flat_car_6d(4.0), flat.flat_unicycle_4d()]
    ),
]


@pytest.mark.parametrize("dyn", CASES, ids=lambda d: d.name)
def test_linearization_matches_finite_differences(dyn):
    spec = dyn.spec(dt=DT, num_time_steps=2)
    rng = np.random.RandomState(42)
    # Modest magnitudes: large random steering angles put tan()/sec^2()
    # in regimes where the 1e-3 FD step is inaccurate (the reference test
    # passes by seed luck there).
    x = (0.5 * rng.randn(spec.xdim)).astype(np.float32)
    us = (
        rng.randn(spec.num_players, spec.umax) * np.asarray(spec.u_mask())
    ).astype(np.float32)

    op = OperatingPoint(
        xs=jnp.tile(jnp.asarray(x)[None], (2, 1)),
        us=jnp.tile(jnp.asarray(us)[None], (2, 1, 1)),
        t0=jnp.float32(0.0),
    )
    lin = dyn_base.linearize(dyn, spec, op)
    A = np.asarray(lin.A[0])
    Bs = np.asarray(lin.Bs[0])

    def disc(x_, us_):
        # One forward-Euler step: the linearization convention the
        # reference uses for its Jacobians.
        return np.asarray(
            x_ + DT * np.asarray(dyn.ode(0.0, jnp.asarray(x_), jnp.asarray(us_)))
        )

    # dA/dx by central differences of the Euler step.
    A_fd = np.zeros_like(A)
    for i in range(spec.xdim):
        xp, xm = x.copy(), x.copy()
        xp[i] += STEP
        xm[i] -= STEP
        A_fd[:, i] = (disc(xp, us) - disc(xm, us)) / (2 * STEP)
    assert np.abs(A - A_fd).max() < TOL, dyn.name

    for p in range(spec.num_players):
        for j in range(spec.udims[p]):
            up, um = us.copy(), us.copy()
            up[p, j] += STEP
            um[p, j] -= STEP
            col_fd = (disc(x, up) - disc(x, um)) / (2 * STEP)
            assert np.abs(Bs[p][:, j] - col_fd).max() < TOL, (dyn.name, p, j)
    # Padded control columns contribute nothing.
    for p in range(spec.num_players):
        for j in range(spec.udims[p], spec.umax):
            assert np.abs(Bs[p][:, j]).max() == 0.0


@pytest.mark.parametrize("dyn", CASES, ids=lambda d: d.name)
def test_analytic_jacobians_match_autodiff(dyn):
    """The hand-written sparse Jacobians (models.py `jac` / `ode_jac`,
    mirroring the reference's analytic Linearize methods) against
    jax.jacfwd of the same vector field, at tight float32 tolerance.
    These run INSIDE Pallas kernels (ops/pallas/stage.py) where jacfwd
    does not lower on Mosaic — this is their correctness oracle."""
    assert dyn.ode_jac is not None, dyn.name
    spec = dyn.spec(dt=DT, num_time_steps=2)
    rng = np.random.RandomState(3)
    for _ in range(5):
        x = (0.5 * rng.randn(spec.xdim)).astype(np.float32)
        us = (
            rng.randn(spec.num_players, spec.umax)
            * np.asarray(spec.u_mask())
        ).astype(np.float32)
        op = OperatingPoint(
            xs=jnp.tile(jnp.asarray(x)[None], (2, 1)),
            us=jnp.tile(jnp.asarray(us)[None], (2, 1, 1)),
            t0=jnp.float32(0.0),
        )
        ana = dyn_base.linearize(dyn, spec, op)
        ad = dyn_base.linearize_autodiff(dyn, spec, op)
        assert np.abs(np.asarray(ana.A) - np.asarray(ad.A)).max() < 2e-6, \
            dyn.name
        assert np.abs(np.asarray(ana.Bs) - np.asarray(ad.Bs)).max() < 2e-6, \
            dyn.name


def test_flat_coordinate_roundtrip():
    """to_linear and from_linear invert each other away from singularities."""
    dyn = flat.concatenate_flat(
        "flat_rt", [flat.flat_car_6d(4.0), flat.flat_unicycle_4d()]
    )
    rng = np.random.RandomState(7)
    for _ in range(10):
        x = rng.randn(10).astype(np.float32)
        x[4] = 2.0 + abs(x[4])  # car speed > 0
        x[3] = np.clip(x[3], -0.5, 0.5)  # modest steering
        x[9] = 1.0 + abs(x[9])  # unicycle speed > 0
        xi = dyn.to_linear_state(jnp.asarray(x))
        x_rt = np.asarray(dyn.from_linear_state(xi))
        assert np.abs(x - x_rt).max() < 1e-3
        assert not bool(dyn.linear_state_singular(xi))
