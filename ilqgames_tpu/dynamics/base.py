"""Dynamics substrate: pure ODE functions, integrators, autodiff linearization.

TPU-native re-design of the reference dynamics hierarchy
(dynamics/multi_player_dynamical_system.h:57-81,
 dynamics/multi_player_integrable_system.h:55-127,
 dynamics/concatenated_dynamical_system.h:57-106).

A multi-player system is a frozen (hashable, identity-eq) dataclass holding
a pure continuous-time vector field `ode(t, x, us)` where `us` is the padded
[P, umax] control stack. Jacobians come from `jax.jacfwd` instead of the
reference's hand-written `Linearize` methods; the discrete-time convention
matches the reference exactly: A = I + dt * df/dx, B_i = dt * df/du_i
(forward-Euler Jacobians even though rollouts use RK4 — see e.g.
dynamics/single_player_unicycle_4d.h:103-119).

Integration matches src/multi_player_dynamical_system.cpp:52-77: either a
single explicit-Euler step, or RK4 with 2 substeps of dt/2 over zero-order-
hold controls.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ilqgames_tpu.types import (GameSpec, LinearDynamics, OperatingPoint,
                                Strategy, scan_unroll)


@dataclasses.dataclass(frozen=True, eq=False)
class SinglePlayerModel:
    """A single player's continuous dynamics: xdot = ode(t, x_sub, u)."""

    name: str
    xdim: int
    udim: int
    ode: Callable  # (t, x_sub [xdim], u [udim]) -> xdot [xdim]
    # Joint-state indices of (px, py) for costs/rendering, if meaningful.
    position_dims: Tuple[int, ...] = ()


@dataclasses.dataclass(frozen=True, eq=False)
class MultiPlayerDynamics:
    """Joint dynamics of all players.

    ode(t, x [xdim], us [P, umax]) -> xdot [xdim], with padded controls.
    `xdims` partitions the joint state into per-player sub-blocks for
    concatenated systems; monolithic systems put the whole state in the
    first entry (remaining entries zero).
    """

    name: str
    xdims: Tuple[int, ...]
    udims: Tuple[int, ...]
    ode: Callable
    # (px, py) joint-state indices per player (for proximity costs, viz).
    position_dims: Tuple[Tuple[int, ...], ...] = ()
    treat_as_linear: bool = False
    # For flat systems: maps between nonlinear state x and linearizing
    # state xi, plus the constant linearization (set by flat.py).
    to_linear_state: Optional[Callable] = None
    from_linear_state: Optional[Callable] = None
    linear_state_singular: Optional[Callable] = None
    constant_linearization: Optional[Callable] = None  # (spec) -> (A, Bs)

    @property
    def num_players(self) -> int:
        return len(self.udims)

    @property
    def xdim(self) -> int:
        return sum(self.xdims)

    def spec(self, dt=None, num_time_steps=None) -> GameSpec:
        kwargs = {}
        if dt is not None:
            kwargs["dt"] = dt
        if num_time_steps is not None:
            kwargs["num_time_steps"] = num_time_steps
        return GameSpec(
            xdims=self.xdims,
            udims=self.udims,
            treat_as_linear=self.treat_as_linear,
            **kwargs,
        )


def concatenate(
    name: str, models: Sequence[SinglePlayerModel]
) -> MultiPlayerDynamics:
    """Joint system from per-player subsystems: block-diagonal vector field
    (reference ConcatenatedDynamicalSystem, src/concatenated_dynamical_system.cpp:69-107)."""
    xdims = tuple(m.xdim for m in models)
    udims = tuple(m.udim for m in models)
    offsets = []
    acc = 0
    for d in xdims:
        offsets.append(acc)
        acc += d

    def ode(t, x, us):
        parts = []
        for i, m in enumerate(models):
            # Static slice (offsets are Python ints): stays a lax.slice
            # under nested vmap, so the trace is gather-free and runs
            # inside Pallas kernels (Mosaic has no >2D gather).
            x_sub = x[offsets[i]:offsets[i] + m.xdim]
            parts.append(m.ode(t, x_sub, us[i, : m.udim]))
        return jnp.concatenate(parts)

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
    )


# ---------------------------------------------------------------------------
# Integration (reference src/multi_player_dynamical_system.cpp:52-77).
# ---------------------------------------------------------------------------
def integrate(
    dyn: MultiPlayerDynamics,
    t: jnp.ndarray,
    dt: float,
    x: jnp.ndarray,
    us: jnp.ndarray,
    use_euler: bool = False,
    num_substeps: int = 2,
) -> jnp.ndarray:
    """One zero-order-hold control step: Euler or RK4 with `num_substeps`."""
    if use_euler:
        return x + dt * dyn.ode(t, x, us)

    h = dt / num_substeps
    for i in range(num_substeps):
        ts = t + i * h
        k1 = h * dyn.ode(ts, x, us)
        k2 = h * dyn.ode(ts + 0.5 * h, x + 0.5 * k1, us)
        k3 = h * dyn.ode(ts + 0.5 * h, x + 0.5 * k2, us)
        k4 = h * dyn.ode(ts + h, x + k3, us)
        x = x + (k1 + 2.0 * (k2 + k3) + k4) / 6.0
    return x


# ---------------------------------------------------------------------------
# Rollout under affine feedback strategies (reference
# ILQSolver::CurrentOperatingPoint, src/ilq_solver.cpp:174-206).
# ---------------------------------------------------------------------------
def rollout(
    dyn: MultiPlayerDynamics,
    spec: GameSpec,
    x0: jnp.ndarray,
    last_op: OperatingPoint,
    strategy: Strategy,
    use_euler: bool = False,
) -> OperatingPoint:
    """Integrate the joint dynamics forward under
    u_i(k) = u_ref_i(k) - P_i[k] (x - x_ref[k]) - alpha_i[k]."""
    u_mask = spec.u_mask()

    def step(x, inputs):
        k, x_ref, u_ref, P, alpha = inputs
        delta_x = x - x_ref
        us = (u_ref - jnp.einsum("pux,x->pu", P, delta_x) - alpha) * u_mask
        t = last_op.t0 + k.astype(jnp.float32) * spec.dt
        x_next = integrate(dyn, t, spec.dt, x, us, use_euler=use_euler)
        return x_next, (x, us)

    ks = jnp.arange(spec.num_time_steps)
    _, (xs, us) = jax.lax.scan(
        step, x0, (ks, last_op.xs, last_op.us, strategy.Ps, strategy.alphas),
        unroll=scan_unroll(),
    )
    return OperatingPoint(xs=xs, us=us, t0=last_op.t0)


# ---------------------------------------------------------------------------
# Discrete-time linearization via autodiff.
# ---------------------------------------------------------------------------
def linearize(
    dyn: MultiPlayerDynamics, spec: GameSpec, op: OperatingPoint
) -> LinearDynamics:
    """A[k] = I + dt * df/dx, Bs[k][i] = dt * df/du_i at every knot (vmapped).

    Matches the reference's analytic discrete Jacobians, which use the
    forward-Euler convention regardless of the RK4 rollout
    (e.g. dynamics/single_player_car_5d.h Linearize)."""
    if dyn.treat_as_linear and dyn.constant_linearization is not None:
        A, Bs = dyn.constant_linearization(spec)
        N = spec.num_time_steps
        return LinearDynamics(
            A=jnp.broadcast_to(A, (N,) + A.shape),
            Bs=jnp.broadcast_to(Bs, (N,) + Bs.shape),
        )

    eye = jnp.eye(spec.xdim, dtype=jnp.float32)

    def lin_at(k, x, us):
        t = op.t0 + k.astype(jnp.float32) * spec.dt
        Jx = jax.jacfwd(lambda xx: dyn.ode(t, xx, us))(x)
        Ju = jax.jacfwd(lambda uu: dyn.ode(t, x, uu))(us)  # [x, P, umax]
        A = eye + spec.dt * Jx
        Bs = spec.dt * jnp.transpose(Ju, (1, 0, 2))  # [P, x, umax]
        return A, Bs

    ks = jnp.arange(spec.num_time_steps)
    A, Bs = jax.vmap(lin_at)(ks, op.xs, op.us)
    return LinearDynamics(A=A, Bs=Bs)
