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
    # Analytic continuous Jacobians as SPARSE entries (the reference's
    # hand-written Linearize, e.g. src/single_player_car_6d.cpp:58-67,
    # minus the I + dt* discretization applied by linearize_core):
    # (t, x_sub, u) -> (jx_entries, ju_entries), each a list of
    # ((row, col), scalar) pairs. Used inside Pallas kernels, where
    # jacfwd's tangent bookkeeping does not lower on Mosaic
    # (tools/tpu_stage_check.txt); autodiff remains the fallback and the
    # test oracle (tests/test_linearization.py).
    jac: Optional[Callable] = None


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
    # Analytic continuous Jacobians in JOINT coordinates:
    # (t, x, us) -> (jx_entries, ju_entries) where jx_entries are
    # ((row, col), scalar) over the joint state and ju_entries are
    # ((row, player, ucol), scalar). Built by `concatenate` from
    # per-model `jac`s; monolithic models provide it directly.
    ode_jac: Optional[Callable] = None

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

    ode_jac = None
    if all(m.jac is not None for m in models):
        # Block-diagonal sparse assembly of the per-player analytic
        # Jacobians (reference ConcatenatedDynamicalSystem::Linearize,
        # src/concatenated_dynamical_system.cpp:86-107).
        def ode_jac(t, x, us):
            jx_entries = []
            ju_entries = []
            for i, m in enumerate(models):
                o = offsets[i]
                x_sub = x[o:o + m.xdim]
                jxe, jue = m.jac(t, x_sub, us[i, : m.udim])
                jx_entries.extend(
                    ((o + r, o + c), v) for (r, c), v in jxe)
                ju_entries.extend(
                    ((o + r, i, c), v) for (r, c), v in jue)
            return jx_entries, ju_entries

    return MultiPlayerDynamics(
        name=name,
        xdims=xdims,
        udims=udims,
        ode=ode,
        position_dims=position_dims,
        ode_jac=ode_jac,
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
# Discrete-time linearization: analytic sparse Jacobians when the model
# provides them (kernel-safe, faster), autodiff otherwise.
# ---------------------------------------------------------------------------
def _assemble_rect(nrows, ncols, entries, like):
    """[nrows, ncols] from static ((i, j), scalar) pairs — built with
    stacks (no scatters: this traces inside Pallas kernels, and Mosaic
    has no scatter lowering). Python-float entries are broadcast against
    `like` so every stacked element has the scalar trace's shape.
    Duplicate indices accumulate."""
    zero = jnp.zeros_like(like)
    acc = {}
    for ij, v in entries:
        v = zero + v  # normalizes python floats / broadcasts under vmap
        acc[ij] = acc[ij] + v if ij in acc else v
    return jnp.stack([
        jnp.stack([acc.get((i, j), zero) for j in range(ncols)])
        for i in range(nrows)
    ])


def linearize_entries(
    dyn: MultiPlayerDynamics, dt: float, umax: int, t, x, us
) -> dict:
    """Per-knot discrete linearization as a dict of SPARSE entries with
    static keys ("A", r, c) / ("Bf", r, p*umax + c) -> scalar, with
    A = I + dt*Jx, Bf = dt*Ju. The fused stage kernel stores these
    directly (no in-kernel stacks — Mosaic rejects wide vreg
    concatenates at mismatched offsets)."""
    jx_entries, ju_entries = dyn.ode_jac(t, x, us)
    like = x[0]
    out = {}

    def add(key, v):
        out[key] = out[key] + v if key in out else v

    one = jnp.full_like(like, 1.0)
    for d in range(sum(dyn.xdims)):
        add(("A", d, d), one)
    for (r, c), v in jx_entries:
        add(("A", r, c), dt * v)
    for (r, p, c), v in ju_entries:
        add(("Bf", r, p * umax + c), dt * v)
    return {k: jnp.zeros_like(like) + v for k, v in out.items()}


def linearize_core(
    dyn: MultiPlayerDynamics, dt: float, umax: int, t, x, us
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-knot discrete linearization from the model's ANALYTIC sparse
    Jacobians: (A [x, x], Bf [x, P*umax]) with A = I + dt*Jx,
    Bf = dt*Ju (forward-Euler convention, as the reference's hand-written
    Linearize methods). Pure stack/arith trace — runs inside Pallas
    kernels where jacfwd does not lower on Mosaic."""
    xdim = sum(dyn.xdims)
    P = dyn.num_players
    jx_entries, ju_entries = dyn.ode_jac(t, x, us)
    like = x[0]
    a_entries = [((d, d), 1.0) for d in range(xdim)]
    a_entries += [((i, j), dt * v) for (i, j), v in jx_entries]
    A = _assemble_rect(xdim, xdim, a_entries, like)
    b_entries = [((i, p * umax + c), dt * v)
                 for (i, p, c), v in ju_entries]
    Bf = _assemble_rect(xdim, P * umax, b_entries, like)
    return A, Bf


def linearize(
    dyn: MultiPlayerDynamics, spec: GameSpec, op: OperatingPoint
) -> LinearDynamics:
    """A[k] = I + dt * df/dx, Bs[k][i] = dt * df/du_i at every knot (vmapped).

    Matches the reference's analytic discrete Jacobians, which use the
    forward-Euler convention regardless of the RK4 rollout
    (e.g. dynamics/single_player_car_5d.h Linearize). Models with
    analytic `ode_jac` use it (same formulas as the reference's
    Linearize); autodiff is the fallback and the cross-check oracle."""
    if dyn.treat_as_linear and dyn.constant_linearization is not None:
        A, Bs = dyn.constant_linearization(spec)
        N = spec.num_time_steps
        return LinearDynamics(
            A=jnp.broadcast_to(A, (N,) + A.shape),
            Bs=jnp.broadcast_to(Bs, (N,) + Bs.shape),
        )

    eye = jnp.eye(spec.xdim, dtype=jnp.float32)

    if dyn.ode_jac is not None:
        def lin_at(k, x, us):
            t = op.t0 + k.astype(jnp.float32) * spec.dt
            A, Bf = linearize_core(dyn, spec.dt, spec.umax, t, x, us)
            Bs = jnp.transpose(
                Bf.reshape(spec.xdim, spec.num_players, spec.umax),
                (1, 0, 2))
            return A, Bs
    else:
        def lin_at(k, x, us):
            t = op.t0 + k.astype(jnp.float32) * spec.dt
            Jx = jax.jacfwd(lambda xx: dyn.ode(t, xx, us))(x)
            Ju = jax.jacfwd(lambda uu: dyn.ode(t, x, uu))(us)  # [x,P,umax]
            A = eye + spec.dt * Jx
            Bs = spec.dt * jnp.transpose(Ju, (1, 0, 2))  # [P, x, umax]
            return A, Bs

    ks = jnp.arange(spec.num_time_steps)
    A, Bs = jax.vmap(lin_at)(ks, op.xs, op.us)
    return LinearDynamics(A=A, Bs=Bs)


def linearize_autodiff(
    dyn: MultiPlayerDynamics, spec: GameSpec, op: OperatingPoint
) -> LinearDynamics:
    """jacfwd-only linearization — the oracle the analytic path is tested
    against (tests/test_linearization.py)."""
    eye = jnp.eye(spec.xdim, dtype=jnp.float32)

    def lin_at(k, x, us):
        t = op.t0 + k.astype(jnp.float32) * spec.dt
        Jx = jax.jacfwd(lambda xx: dyn.ode(t, xx, us))(x)
        Ju = jax.jacfwd(lambda uu: dyn.ode(t, x, uu))(us)
        return eye + spec.dt * Jx, spec.dt * jnp.transpose(Ju, (1, 0, 2))

    ks = jnp.arange(spec.num_time_steps)
    A, Bs = jax.vmap(lin_at)(ks, op.xs, op.us)
    return LinearDynamics(A=A, Bs=Bs)
