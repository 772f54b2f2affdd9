"""Feedback LQ Nash solver (coupled Riccati recursion) as a jax.lax.scan.

Solves a time-varying finite-horizon LQ game for feedback Nash equilibrium
strategies of all players (Basar & Olsder, Corollary 6.1). Dynamics are in
delta coordinates (dx_{k+1} = A_k dx_k + sum_i B_i[k] du_i[k], zero drift).

Behavioral parity with the reference implementation
(src/lq_feedback_solver.cpp:71-244):
  * Z_i, zeta_i initialized from the *final* quadraticization (terminal cost);
    the backward recursion runs k = N-2 .. 0 using stage quad k.
  * Coupling matrix S with blocks S[ii][jj] = B_i^T Z_i B_j (+ R_ii on the
    diagonal); RHS Y = [B_i^T Z_i A | B_i^T zeta_i + r_ii].
  * Optional adaptive regularization of S via the Gershgorin circle theorem
    with min eigenvalue 1e-3 (src/lq_feedback_solver.cpp:163-176).
  * Value updates Z_i <- F^T Z_i F + Q_i + sum_j P_j^T R_ij P_j and
    zeta_i <- F^T (zeta_i + Z_i beta) + l_i + sum_j P_j^T (R_ij a_j - r_ij)
    with F = A - sum_i B_i P_i, beta = -sum_i B_i a_i.
  * Forward pass computes delta_x* and costates -Z_{k+1} dx* - zeta_{k+1}
    (zero at the final step).

TPU notes: all per-player structure is dense/padded ([P, umax]); padded
control entries carry an identity diagonal in S so the batched LU solve is
well-posed and returns exactly zero gains there. The whole function is
vmap-able over a leading batch axis — matrices here are tiny (x <= ~20), so
throughput comes from batching thousands of game instances, which XLA maps
onto the VPU/MXU lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ilqgames_tpu.types import (
    scan_unroll,
    GameSpec,
    LinearDynamics,
    LQSolution,
    QuadraticCosts,
    Strategy,
)

_MIN_GERSHGORIN_EVAL = 1e-3


def _gershgorin_regularize(S: jnp.ndarray) -> jnp.ndarray:
    """Shift diagonal entries so Gershgorin column circles exclude
    eigenvalues below _MIN_GERSHGORIN_EVAL."""
    diag = jnp.diagonal(S)
    radius = jnp.sum(jnp.abs(S), axis=0) - jnp.abs(diag)
    eval_lo = diag - radius
    bump = jnp.where(eval_lo < _MIN_GERSHGORIN_EVAL, radius + _MIN_GERSHGORIN_EVAL, 0.0)
    return S + jnp.diag(bump)


def stage_gains_and_value(spec, eyeP, pad_diag, A, B, Q, l, R, r, Z, zeta,
                          adaptive_regularization):
    """ONE backward Riccati stage (Basar & Olsder Cor. 6.1; reference
    src/lq_feedback_solver.cpp:110-214): given the value function
    (Z, zeta) at knot k+1 and stage-k operands, solve the coupled gain
    system and return (P_mat, alpha, Z_new, zeta_new) — the gains at k
    and the value function at k. Shared by the sequential scan below and
    the parallel-in-time sweeps (solver/lq_pint.py); op-for-op identical
    to the pre-refactor scan body."""
    P = spec.num_players
    x = spec.xdim
    u = spec.umax

    # R_ii / r_ii (own-control cost blocks).
    R_diag = jnp.einsum("iiuv->iuv", R)  # [P,u,u]
    r_diag = jnp.einsum("iiu->iu", r)  # [P,u]

    # B_i^T Z_i : [P, u, x]
    BiZ = jnp.einsum("ixu,ixy->iuy", B, Z)

    # Coupling matrix S: blocks [i,j] = B_i^T Z_i B_j (+ R_ii on diag).
    S_blocks = jnp.einsum("iuy,jyv->ijuv", BiZ, B)
    S_blocks = S_blocks + eyeP[:, :, None, None] * R_diag[:, None]
    S = S_blocks.transpose(0, 2, 1, 3).reshape(P * u, P * u) + pad_diag

    if adaptive_regularization:
        S = _gershgorin_regularize(S)

    # RHS: [P*u, x] for gains, [P*u] for affine terms.
    Y_P = jnp.einsum("iuy,yz->iuz", BiZ, A).reshape(P * u, x)
    Y_a = (jnp.einsum("ixu,ix->iu", B, zeta) + r_diag).reshape(P * u)
    Y = jnp.concatenate([Y_P, Y_a[:, None]], axis=1)

    X = jnp.linalg.solve(S, Y)
    P_mat = X[:, :x].reshape(P, u, x)
    alpha = X[:, x].reshape(P, u)

    # Closed-loop transition and drift.
    F = A - jnp.einsum("ixu,iuz->xz", B, P_mat)
    beta = -jnp.einsum("ixu,iu->x", B, alpha)

    # Value function updates (including cross-control R_ij terms; absent
    # couplings are dense zeros so the sums are exact).
    Ra = jnp.einsum("ijuv,jv->iju", R, alpha)
    zeta_new = (
        jnp.einsum("xz,ix->iz", F, zeta + jnp.einsum("ixy,y->ix", Z, beta))
        + l
        + jnp.einsum("jua,iju->ia", P_mat, Ra - r)
    )
    Z_new = (
        jnp.einsum("xa,ixy,yb->iab", F, Z, F)
        + Q
        + jnp.einsum("jua,ijuv,jvb->iab", P_mat, R, P_mat)
    )
    return P_mat, alpha, Z_new, zeta_new


def solve_lq_feedback(
    spec: GameSpec,
    lin: LinearDynamics,
    quad: QuadraticCosts,
    x0: jnp.ndarray,
    adaptive_regularization: bool = True,
) -> LQSolution:
    """Solve the time-varying LQ game for feedback Nash strategies.

    Args:
      spec: static game shapes.
      lin:  A [N,x,x], Bs [N,P,x,umax].
      quad: Q [N,P,x,x], l [N,P,x], R [N,P,P,umax,umax], r [N,P,P,umax].
      x0:   [x] initial delta-state (x0 - operating point's first state).

    Returns LQSolution with strategy (Ps [N,P,umax,x], alphas [N,P,umax]),
    delta_xs [N,x] and costates [N,P,x].
    """
    N = spec.num_time_steps
    P = spec.num_players
    x = spec.xdim
    u = spec.umax
    eyeP = jnp.eye(P, dtype=jnp.float32)

    # Identity on padded control entries keeps S invertible there; the
    # corresponding RHS rows are zero so padded gains come out exactly 0.
    pad_diag = jnp.diag((1.0 - spec.u_mask().reshape(P * u)))

    # Terminal condition from the final-stage quadraticization.
    Z_T = quad.Q[N - 1]  # [P, x, x]
    zeta_T = quad.l[N - 1]  # [P, x]

    def backward_step(carry, stage):
        Z, zeta = carry  # [P,x,x], [P,x]
        A, B, Q, l, R, r = stage
        P_mat, alpha, Z_new, zeta_new = stage_gains_and_value(
            spec, eyeP, pad_diag, A, B, Q, l, R, r, Z, zeta,
            adaptive_regularization)
        # Emit the incoming (k+1) value terms for the costate forward pass.
        return (Z_new, zeta_new), (P_mat, alpha, Z, zeta)

    stages = (
        lin.A[: N - 1],
        lin.Bs[: N - 1],
        quad.Q[: N - 1],
        quad.l[: N - 1],
        quad.R[: N - 1],
        quad.r[: N - 1],
    )
    (_, _), (Ps_rev, alphas_rev, Znext, zetanext) = jax.lax.scan(
        backward_step, (Z_T, zeta_T), stages, reverse=True,
        unroll=scan_unroll(),
    )

    # Final timestep strategies stay zero (reference never writes them).
    Ps = jnp.concatenate([Ps_rev, jnp.zeros((1, P, u, x), Ps_rev.dtype)], axis=0)
    alphas = jnp.concatenate(
        [alphas_rev, jnp.zeros((1, P, u), alphas_rev.dtype)], axis=0
    )

    # Forward pass: delta_x* trajectory and costates.
    def forward_step(x_star, stage):
        A, B, alpha, Zn, zn = stage
        costate = -jnp.einsum("ixy,y->ix", Zn, x_star) - zn
        x_next = jnp.einsum("xy,y->x", A, x_star) - jnp.einsum(
            "ixu,iu->x", B, alpha
        )
        return x_next, (x_star, costate)

    fwd_stages = (lin.A[: N - 1], lin.Bs[: N - 1], alphas_rev, Znext, zetanext)
    x_last, (dxs, costates) = jax.lax.scan(
        forward_step, x0, fwd_stages, unroll=scan_unroll()
    )

    delta_xs = jnp.concatenate([dxs, x_last[None]], axis=0)
    costates = jnp.concatenate(
        [costates, jnp.zeros((1, P, x), costates.dtype)], axis=0
    )

    return LQSolution(
        strategy=Strategy(Ps=Ps, alphas=alphas),
        delta_xs=delta_xs,
        costates=costates,
    )
