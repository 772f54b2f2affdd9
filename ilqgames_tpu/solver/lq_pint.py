"""Parallel-in-time coupled-Riccati solver (Picard/Jacobi sweeps).

The feedback LQ Nash recursion (solver/lq_feedback.py; reference
src/lq_feedback_solver.cpp:110-214) is inherently sequential: the value
function at knot k needs the value at k+1. For SINGLE-player LQR that
recursion is a linear-fractional (symplectic) map, so exact
parallelization via chunked condensation exists (Laine & Tomlin,
"The Parallelization of Riccati Recursion", arXiv:1809.06360). For
N-player FEEDBACK Nash the stage map
    V_k = Phi_k(V_{k+1}),   V = (Z^1..Z^P, zeta^1..zeta^P)
is rational of growing degree under composition (each stage solves the
coupled gain system S(Z) X = Y(Z, zeta) and re-quadratizes), so no
closed-form chunk parameterization is available. What IS available is
fixed-point iteration over the whole horizon:

    V^{(m+1)}_k = Phi_k(V^{(m)}_{k+1})   for ALL k in parallel,

with V_{N-1} pinned at the terminal quadraticization. Each sweep costs
one stage map evaluated at every knot simultaneously (a [N-1]-vmapped
batch of tiny dense solves — MXU/VPU-friendly), and information
propagates backward one knot per sweep, so after m sweeps the last m
knots are EXACT; convergence at earlier knots relies on the Riccati
map's contraction. Worst case m = N-1 sweeps reproduces the sequential
recursion exactly (total work N^2/2 stage maps, but depth m instead of
N); in practice the map contracts and sweeps-to-tolerance is measured
by tools/pint_crossover.py on real flagship stage operands.

The forward (trajectory + costate) pass is a bona fide affine recurrence
dx_{k+1} = F_k dx_k + beta_k, parallelized EXACTLY here with
jax.lax.associative_scan over affine-map composition — log2(N) depth.

Use case: single-instance latency (a receding-horizon replan on an
otherwise idle chip). The production batched path keeps the sequential
kernel: with >=128 lanes in flight the horizon scan is compute-bound,
not latency-bound, and sweeps would multiply total work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ilqgames_tpu.solver.lq_feedback import stage_gains_and_value
from ilqgames_tpu.types import (
    GameSpec,
    LinearDynamics,
    LQSolution,
    QuadraticCosts,
    Strategy,
)


def _sweep(spec, eyeP, pad_diag, stages, Z_all, zeta_all,
           adaptive_regularization):
    """One Jacobi sweep: V_new[k] = Phi_k(V_old[k+1]) for every k.

    Z_all/zeta_all hold the value function at knots 0..N-1
    ([N,P,x,x] / [N,P,x]); index N-1 is the pinned terminal value.
    Returns (P_mats, alphas, Z_new, zeta_new) with gains for knots
    0..N-2 and the updated values (terminal row re-pinned).
    """
    A, B, Q, l, R, r = stages
    stage_vm = jax.vmap(
        lambda A_, B_, Q_, l_, R_, r_, Z_, zeta_: stage_gains_and_value(
            spec, eyeP, pad_diag, A_, B_, Q_, l_, R_, r_, Z_, zeta_,
            adaptive_regularization)
    )
    P_mats, alphas, Z_upd, zeta_upd = stage_vm(
        A, B, Q, l, R, r, Z_all[1:], zeta_all[1:])
    Z_new = jnp.concatenate([Z_upd, Z_all[-1:]], axis=0)
    zeta_new = jnp.concatenate([zeta_upd, zeta_all[-1:]], axis=0)
    return P_mats, alphas, Z_new, zeta_new


def solve_lq_feedback_pint(
    spec: GameSpec,
    lin: LinearDynamics,
    quad: QuadraticCosts,
    x0: jnp.ndarray,
    num_sweeps: int,
    adaptive_regularization: bool = True,
) -> LQSolution:
    """Parallel-in-time feedback LQ Nash solve with a fixed sweep count.

    num_sweeps >= N-1 is EXACTLY the sequential recursion (information
    has fully propagated); smaller counts are approximations whose error
    tools/pint_crossover.py quantifies on real operands. Interfaces and
    output layout match solve_lq_feedback.
    """
    N = spec.num_time_steps
    P = spec.num_players
    x = spec.xdim
    u = spec.umax
    eyeP = jnp.eye(P, dtype=jnp.float32)
    pad_diag = jnp.diag((1.0 - spec.u_mask().reshape(P * u)))

    stages = (
        lin.A[: N - 1],
        lin.Bs[: N - 1],
        quad.Q[: N - 1],
        quad.l[: N - 1],
        quad.R[: N - 1],
        quad.r[: N - 1],
    )
    Z_all = jnp.broadcast_to(quad.Q[N - 1][None], (N, P, x, x))
    zeta_all = jnp.broadcast_to(quad.l[N - 1][None], (N, P, x))

    def body(carry, _):
        Z_all, zeta_all = carry
        P_mats, alphas, Z_new, zeta_new = _sweep(
            spec, eyeP, pad_diag, stages, Z_all, zeta_all,
            adaptive_regularization)
        return (Z_new, zeta_new), None

    (Z_all, zeta_all), _ = jax.lax.scan(
        body, (Z_all, zeta_all), None, length=max(num_sweeps - 1, 0))
    # Final sweep emits the gains consistent with the converged values.
    P_mats, alphas_b, Z_all, zeta_all = _sweep(
        spec, eyeP, pad_diag, stages, Z_all, zeta_all,
        adaptive_regularization)

    Ps = jnp.concatenate(
        [P_mats, jnp.zeros((1, P, u, x), P_mats.dtype)], axis=0)
    alphas = jnp.concatenate(
        [alphas_b, jnp.zeros((1, P, u), alphas_b.dtype)], axis=0)

    # EXACT parallel forward pass: compose affine maps
    # dx_{k+1} = F_k dx_k + beta_k with associative_scan (depth log2 N).
    # F_k is the PLAIN A_k, not the closed loop A - sum B P: the
    # reference's shipped forward pass omits the feedback term
    # (src/lq_feedback_solver.cpp:236-239), and solve_lq_feedback
    # replicates that — so must this one.
    A, B = stages[0], stages[1]
    F = A
    beta = -jnp.einsum("kixu,kiu->kx", B, alphas_b)

    def compose(a, b):
        Fa, ba = a
        Fb, bb = b
        return jnp.einsum("k...xy,k...yz->k...xz", Fb, Fa), (
            jnp.einsum("k...xy,k...y->k...x", Fb, ba) + bb)

    Fc, bc = jax.lax.associative_scan(compose, (F, beta), axis=0)
    # dx_{k+1} = Fc[k] x0 + bc[k] for k = 0..N-2.
    dx_tail = jnp.einsum("kxy,y->kx", Fc, x0) + bc
    delta_xs = jnp.concatenate([x0[None], dx_tail], axis=0)

    # Costates at knot k from the k+1 value terms and dx_k, exactly as
    # solve_lq_feedback's forward scan.
    costates = (
        -jnp.einsum("kixy,ky->kix", Z_all[1:], delta_xs[:-1])
        - zeta_all[1:]
    )
    costates = jnp.concatenate(
        [costates, jnp.zeros((1, P, x), costates.dtype)], axis=0)

    return LQSolution(
        strategy=Strategy(Ps=Ps, alphas=alphas),
        delta_xs=delta_xs,
        costates=costates,
    )
