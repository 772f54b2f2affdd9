"""Open-loop LQ Nash solver as a pair of jax.lax.scans.

Solves a time-varying finite-horizon LQ game for an *open-loop* Nash
equilibrium (Basar & Olsder ch. 6; reference derivation in
derivations/open_loop_lq_nash.pdf). Strategies are returned in affine
feedback form with P == 0 and alpha = -u* (only the affine terms nonzero),
matching the reference (src/lq_open_loop_solver.cpp:96-102).

Behavioral parity with src/lq_open_loop_solver.cpp:73-195:
  backward k = N-2 .. 0:
    warped_B_i = R_ii^{-1} B_i^T,  warped_r_i = R_ii^{-1} r_ii
    Lambda = I + sum_i B_i warped_B_i M_i^{k+1}
    intermediate = -sum_i B_i (warped_B_i m_i^{k+1} + warped_r_i)
    M_i^k = Q_i + A^T M_i^{k+1} Lambda^{-1} A
    m_i^k = l_i + A^T (m_i^{k+1} + M_i^{k+1} Lambda^{-1} intermediate)
  forward k = 0 .. N-2:
    x* <- Lambda^{-1} (A x* + intermediate)
    alpha_i = warped_B_i (M_i^{k+1} x* + m_i^{k+1}) + warped_r_i
    costate_i = A^T (M_i^{k+1} x* + m_i^{k+1})

Padded control entries get an identity diagonal in R_ii so the solves are
well-posed; their B columns are zero so they contribute nothing.
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


def solve_lq_open_loop(
    spec: GameSpec,
    lin: LinearDynamics,
    quad: QuadraticCosts,
    x0: jnp.ndarray,
) -> LQSolution:
    """Solve the time-varying LQ game for open-loop Nash strategies."""
    N = spec.num_time_steps
    P = spec.num_players
    x = spec.xdim
    u = spec.umax

    # [P, u, u] with 1.0 on padded diagonal entries so R_ii stays invertible.
    pad_diag_u = jax.vmap(jnp.diag)(1.0 - spec.u_mask())

    eye_x = jnp.eye(x, dtype=jnp.float32)

    M_T = quad.Q[N - 1]  # [P, x, x]
    m_T = quad.l[N - 1]  # [P, x]

    def backward_step(carry, stage):
        M, m = carry  # value terms at k+1
        A, B, Q, l, R, r = stage

        R_diag = jnp.einsum("iiuv->iuv", R) + pad_diag_u  # [P,u,u]
        r_diag = jnp.einsum("iiu->iu", r)  # [P,u]

        # warped_B_i = R_ii^{-1} B_i^T : [P, u, x]; warped_r_i : [P, u]
        Bt = B.transpose(0, 2, 1)  # [P, u, x]
        warped_B = jnp.linalg.solve(R_diag, Bt)
        warped_r = jnp.linalg.solve(R_diag, r_diag[..., None])[..., 0]

        # Lambda = I + sum_i B_i warped_B_i M_i^{k+1}
        Lam = eye_x + jnp.einsum("ixu,iuy,iyz->xz", B, warped_B, M)

        # intermediate = -sum_i B_i (warped_B_i m_i + warped_r_i)
        inter = -jnp.einsum(
            "ixu,iu->x", B, jnp.einsum("iux,ix->iu", warped_B, m) + warped_r
        )

        Lam_inv_A = jnp.linalg.solve(Lam, A)  # [x, x]
        Lam_inv_inter = jnp.linalg.solve(Lam, inter)  # [x]

        M_new = Q + jnp.einsum("yx,iyz,zw->ixw", A, M, Lam_inv_A)
        m_new = l + jnp.einsum(
            "yx,iy->ix", A, m + jnp.einsum("iyz,z->iy", M, Lam_inv_inter)
        )

        # Cache per-stage terms for the forward pass (value terms at k+1).
        cache = (warped_B, warped_r, Lam, inter, M, m)
        return (M_new, m_new), cache

    stages = (
        lin.A[: N - 1],
        lin.Bs[: N - 1],
        quad.Q[: N - 1],
        quad.l[: N - 1],
        quad.R[: N - 1],
        quad.r[: N - 1],
    )
    _, caches = jax.lax.scan(
        backward_step, (M_T, m_T), stages, reverse=True,
        unroll=scan_unroll(),
    )

    def forward_step(x_star, cache):
        A, warped_B, warped_r, Lam, inter, Mn, mn = cache
        dx_k = x_star
        x_next = jnp.linalg.solve(Lam, A @ x_star + inter)
        inner = jnp.einsum("ixy,y->ix", Mn, x_next) + mn  # [P, x]
        alpha = jnp.einsum("iux,ix->iu", warped_B, inner) + warped_r
        costate = jnp.einsum("yx,iy->ix", A, inner)
        return x_next, (dx_k, alpha, costate)

    fwd = (lin.A[: N - 1],) + caches
    x_last, (dxs, alphas, costates) = jax.lax.scan(
        forward_step, x0, fwd, unroll=scan_unroll()
    )

    delta_xs = jnp.concatenate([dxs, x_last[None]], axis=0)
    alphas = jnp.concatenate([alphas, jnp.zeros((1, P, u), alphas.dtype)], axis=0)
    costates = jnp.concatenate(
        [costates, jnp.zeros((1, P, x), costates.dtype)], axis=0
    )

    return LQSolution(
        strategy=Strategy(
            Ps=jnp.zeros((N, P, u, x), jnp.float32), alphas=alphas
        ),
        delta_xs=delta_xs,
        costates=costates,
    )
