"""Feedback-linearizable ("flat") systems.

TPU-native re-design of the reference flat hierarchy
(dynamics/multi_player_flat_system.h:58-121,
 dynamics/single_player_flat_system.h,
 src/concatenated_flat_system.cpp): a flat system evolves exactly as a
LINEAR system in coordinates xi with auxiliary controls v, so the solver
never re-linearizes (`treat_as_linear`), computes one constant discrete
(A, Bs) up front (src/ilq_solver.cpp:83-85), and authors costs directly in
xi. Maps:
  xi = to_linear(x), x = from_linear(xi)
  u  = M_inv(x) @ (v - m(x))   (inverse decoupling matrix + affine term)

The reference's hand-coded Partial() grad/Hessian tables
(src/single_player_flat_car_6d.cpp:121-278) are not needed: cost
coordinate changes (used by the sufficient-Nash check,
src/concatenated_flat_system.cpp:246-330) fall out of jax.grad/jax.hessian
through `from_linear`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from ilqgames_tpu.dynamics.base import MultiPlayerDynamics
from ilqgames_tpu.types import GameSpec


@dataclasses.dataclass(frozen=True, eq=False)
class FlatSinglePlayerModel:
    """One player's flat subsystem. xi and x share the same dimension."""

    name: str
    xdim: int
    udim: int
    # Continuous LINEAR dynamics in xi coords: xi_dot = A_c xi + B_c v.
    cont_A: Tuple[Tuple[float, ...], ...]  # row-major xdim x xdim
    cont_B: Tuple[Tuple[float, ...], ...]  # xdim x udim
    # Nonlinear vector field in real coordinates (for parity rollouts).
    ode: Callable  # (t, x, u) -> xdot
    to_linear: Callable  # x -> xi
    from_linear: Callable  # xi -> x
    inv_decoupling: Callable  # x -> [udim, udim]
    affine_term: Callable  # x -> [udim]
    is_singular: Callable  # xi -> bool scalar
    position_dims: Tuple[int, ...] = (0, 1)


# Reference sgn-with-offset hack (single_player_flat_unicycle_4d.h:191-195):
# keeps the decoupling matrix finite near v == 0; affects the fixed point,
# so replicated exactly.
def _v_offset(v):
    return v + jnp.sign(v + 1e-7) * 0.00011


def flat_unicycle_4d() -> FlatSinglePlayerModel:
    """Flat unicycle: x = [px py theta v], xi = [px py vx vy], double
    integrator (reference dynamics/single_player_flat_unicycle_4d.h)."""

    def ode(t, x, u):
        return jnp.array([x[3] * jnp.cos(x[2]), x[3] * jnp.sin(x[2]), u[0], u[1]])

    def to_linear(x):
        return jnp.array([x[0], x[1], x[3] * jnp.cos(x[2]), x[3] * jnp.sin(x[2])])

    def from_linear(xi):
        return jnp.array(
            [xi[0], xi[1], jnp.arctan2(xi[3], xi[2]),
             jnp.sqrt(xi[2] * xi[2] + xi[3] * xi[3])]
        )

    def inv_decoupling(x):
        s, c = jnp.sin(x[2]), jnp.cos(x[2])
        v = _v_offset(x[3])
        return jnp.array([[c, s], [-s / v, c / v]])

    def affine_term(x):
        return jnp.zeros((2,), jnp.float32)

    def is_singular(xi):
        tol = 1e-2
        bad = jnp.isnan(xi[2]) | jnp.isnan(xi[3])
        return bad | ((jnp.abs(xi[2]) < tol) & (jnp.abs(xi[3]) < tol))

    A = ((0, 0, 1, 0), (0, 0, 0, 1), (0, 0, 0, 0), (0, 0, 0, 0))
    B = ((0, 0), (0, 0), (1, 0), (0, 1))
    return FlatSinglePlayerModel(
        "flat_unicycle_4d", 4, 2, A, B, ode, to_linear, from_linear,
        inv_decoupling, affine_term, is_singular,
    )


def flat_car_6d(inter_axle_distance: float) -> FlatSinglePlayerModel:
    """Flat 6D bicycle: x = [px py theta phi v a], xi = [px py vx vy ax ay],
    triple integrator (reference dynamics/single_player_flat_car_6d.h)."""
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

    def to_linear(x):
        s, c = jnp.sin(x[2]), jnp.cos(x[2])
        tan_phi = jnp.tan(x[3])
        vv_over_l = x[4] * x[4] / L
        return jnp.array(
            [
                x[0],
                x[1],
                x[4] * c,
                x[4] * s,
                x[5] * c - vv_over_l * s * tan_phi,
                x[5] * s + vv_over_l * c * tan_phi,
            ]
        )

    def from_linear(xi):
        theta = jnp.arctan2(xi[3], xi[2])
        v = jnp.sqrt(xi[2] * xi[2] + xi[3] * xi[3])
        c, s = xi[2] / v, xi[3] / v
        a = c * xi[4] + s * xi[5]
        phi = jnp.arctan((a * c - xi[4]) * L / (v * v * s))
        return jnp.array([xi[0], xi[1], theta, phi, v, a])

    def inv_decoupling(x):
        s, c = jnp.sin(x[2]), jnp.cos(x[2])
        v = _v_offset(x[4])
        cos_phi_v = jnp.cos(x[3]) / v
        scaling = L * cos_phi_v * cos_phi_v
        return jnp.array([[-scaling * s, scaling * c], [c, s]])

    def affine_term(x):
        s, c = jnp.sin(x[2]), jnp.cos(x[2])
        tan_phi = jnp.tan(x[3])
        v_over_l = x[4] / L
        return jnp.array(
            [
                -v_over_l * tan_phi
                * (3.0 * x[5] * s + v_over_l * x[4] * tan_phi * c),
                v_over_l * tan_phi
                * (3.0 * x[5] * c - v_over_l * x[4] * tan_phi * s),
            ]
        )

    def is_singular(xi):
        tol = 1e-2
        bad = jnp.isnan(xi[2]) | jnp.isnan(xi[3])
        return bad | ((jnp.abs(xi[2]) < tol) & (jnp.abs(xi[3]) < tol))

    A = (
        (0, 0, 1, 0, 0, 0),
        (0, 0, 0, 1, 0, 0),
        (0, 0, 0, 0, 1, 0),
        (0, 0, 0, 0, 0, 1),
        (0, 0, 0, 0, 0, 0),
        (0, 0, 0, 0, 0, 0),
    )
    B = ((0, 0), (0, 0), (0, 0), (0, 0), (1, 0), (0, 1))
    return FlatSinglePlayerModel(
        "flat_car_6d", 6, 2, A, B, ode, to_linear, from_linear,
        inv_decoupling, affine_term, is_singular,
    )


def concatenate_flat(
    name: str, models: Sequence[FlatSinglePlayerModel]
) -> MultiPlayerDynamics:
    """Joint flat system: block-diagonal constant linear dynamics in xi,
    stacked coordinate maps (reference ConcatenatedFlatSystem,
    src/concatenated_flat_system.cpp:86-132)."""
    xdims = tuple(m.xdim for m in models)
    udims = tuple(m.udim for m in models)
    offsets = []
    acc = 0
    for d in xdims:
        offsets.append(acc)
        acc += d
    xdim = acc
    umax = max(udims)

    import numpy as np

    A_cont = np.zeros((xdim, xdim), np.float32)
    B_cont = np.zeros((len(models), xdim, umax), np.float32)
    for i, m in enumerate(models):
        o = offsets[i]
        A_cont[o : o + m.xdim, o : o + m.xdim] = np.asarray(m.cont_A, np.float32)
        B_cont[i, o : o + m.xdim, : m.udim] = np.asarray(m.cont_B, np.float32)
    A_cont_j = jnp.asarray(A_cont)
    B_cont_j = jnp.asarray(B_cont)

    # Sparse scalar-unrolled vector field: integrator-chain rows have
    # 1-2 nonzeros, and Pallas kernels trace this function in-kernel
    # where Mosaic cannot capture array constants (ops/pallas/sweep.py).
    rows_a = [
        [(c, float(A_cont[r, c])) for c in range(xdim) if A_cont[r, c] != 0.0]
        for r in range(xdim)
    ]
    rows_b = [
        [
            (p, c, float(B_cont[p, r, c]))
            for p in range(len(models))
            for c in range(umax)
            if B_cont[p, r, c] != 0.0
        ]
        for r in range(xdim)
    ]

    def ode(t, xi, vs):
        outs = []
        for r in range(xdim):
            acc = xi[r] * 0.0
            for c, a in rows_a[r]:
                acc = acc + a * xi[c]
            for p, c, b in rows_b[r]:
                acc = acc + b * vs[p, c]
            outs.append(acc)
        return jnp.stack(outs)

    def constant_linearization(spec: GameSpec):
        # Forward-Euler discretization, matching the reference's
        # LinearizedSystem (A = I + dt*A_c, B_i = dt*B_c_i).
        A = jnp.eye(xdim, dtype=jnp.float32) + spec.dt * A_cont_j
        Bs = spec.dt * B_cont_j
        return A, Bs

    def ode_jac(t, xi, vs):
        # The flat system IS linear in xi: the Jacobians are the constant
        # sparse entries (kernel-safe form for ops/pallas/stage.py).
        jx_entries = [((r, c), a)
                      for r in range(xdim) for c, a in rows_a[r]]
        ju_entries = [((r, p, c), b)
                      for r in range(xdim) for p, c, b in rows_b[r]]
        return jx_entries, ju_entries

    def _per_player(fn_name):
        def apply(z):
            parts = []
            for i, m in enumerate(models):
                sub = jax.lax.dynamic_slice_in_dim(z, offsets[i], m.xdim)
                parts.append(getattr(m, fn_name)(sub))
            return jnp.concatenate(parts)

        return apply

    to_linear_state = _per_player("to_linear")
    from_linear_state = _per_player("from_linear")

    def linear_state_singular(xi):
        flags = []
        for i, m in enumerate(models):
            sub = jax.lax.dynamic_slice_in_dim(xi, offsets[i], m.xdim)
            flags.append(m.is_singular(sub))
        return jnp.any(jnp.stack(flags))

    position_dims = tuple(
        tuple(offsets[i] + d for d in m.position_dims)
        for i, m in enumerate(models)
    )
    return MultiPlayerDynamics(
        name=name,
        xdims=xdims,
        udims=udims,
        ode=ode,
        position_dims=position_dims,
        treat_as_linear=True,
        to_linear_state=to_linear_state,
        from_linear_state=from_linear_state,
        linear_state_singular=linear_state_singular,
        constant_linearization=constant_linearization,
        ode_jac=ode_jac,
    )


def linear_controls_to_real(
    models: Sequence[FlatSinglePlayerModel], x: jnp.ndarray, vs: jnp.ndarray
) -> jnp.ndarray:
    """u_i = M_inv_i(x_i) @ (v_i - m_i(x_i)) for all players, padded
    (reference MultiPlayerFlatSystem::LinearizingControl)."""
    offsets = []
    acc = 0
    for m in models:
        offsets.append(acc)
        acc += m.xdim
    umax = vs.shape[-1]
    outs = []
    for i, m in enumerate(models):
        x_sub = jax.lax.dynamic_slice_in_dim(x, offsets[i], m.xdim)
        u = m.inv_decoupling(x_sub) @ (vs[i, : m.udim] - m.affine_term(x_sub))
        outs.append(jnp.pad(u, (0, umax - m.udim)))
    return jnp.stack(outs)
