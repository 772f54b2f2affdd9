"""Nash-equilibrium verification oracles.

Reference parity:
  * ComputeStrategyCosts (src/compute_strategy_costs.cpp:60-105): Euler
    rollout under the strategies, per-player cost accumulation; the
    open-loop variant plays alphas only (zero state feedback) and evaluates
    state costs at the *next* state (EvaluateOffset).
  * NumericalCheckLocalNashEquilibrium
    (src/check_local_nash_equilibrium.cpp:60-131): perturb every alpha
    coordinate at every timestep by +/- epsilon; a unilateral improvement
    for the perturbing player refutes the (local) Nash property.
  * CheckSufficientLocalNashEquilibrium (:144-200): PSD check of all
    Q / R_ij along the trajectory.

TPU design: all perturbations are evaluated in one vmapped batch of Euler
rollouts instead of the reference's O(P*N*u) sequential re-rollouts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.types import GameSpec, OperatingPoint, Strategy


def compute_strategy_costs(
    dyn,
    player_costs,
    spec: GameSpec,
    strategy: Strategy,
    op: OperatingPoint,
    x0: jnp.ndarray,
    open_loop: bool = False,
) -> jnp.ndarray:
    """Per-player total cost of playing `strategy` from x0 (Euler rollouts)."""
    N = spec.num_time_steps
    u_mask = spec.u_mask()
    num_steps = N - 1 if open_loop else N

    def step(carry, inputs):
        x, t = carry
        x_ref, u_ref, P, alpha = inputs
        delta_x = jnp.zeros_like(x) if open_loop else (x - x_ref)
        us = (u_ref - jnp.einsum("pux,x->pu", P, delta_x) - alpha) * u_mask
        x_next = x + spec.dt * dyn.ode(t, x, us)
        t_next = t + spec.dt

        if open_loop:
            # EvaluateOffset: state costs at next state/time, control at t.
            costs = []
            for pc in player_costs:
                c = jnp.asarray(0.0, jnp.float32)
                for sc in pc.state_costs:
                    c = c + sc.evaluate(t_next, x_next)
                for j, cc in pc.control_costs:
                    c = c + cc.evaluate(t, us[j])
                costs.append(c)
        else:
            costs = [pc.evaluate_stage(t, x, us) for pc in player_costs]

        return (x_next, t_next), jnp.stack(costs)

    inputs = (
        op.xs[:num_steps],
        op.us[:num_steps],
        strategy.Ps[:num_steps],
        strategy.alphas[:num_steps],
    )
    (_, _), stage_costs = jax.lax.scan(
        step, (x0, jnp.asarray(0.0, jnp.float32)), inputs
    )
    return jnp.sum(stage_costs, axis=0)  # [P]


def numerical_check_local_nash(
    dyn,
    player_costs,
    spec: GameSpec,
    strategy: Strategy,
    op: OperatingPoint,
    x0: jnp.ndarray,
    max_perturbation: float = 0.1,
    open_loop: bool = False,
) -> jnp.ndarray:
    """True iff no single-coordinate alpha perturbation of size
    +/- max_perturbation improves the perturbing player's cost."""
    N = spec.num_time_steps
    P = spec.num_players
    um = spec.umax

    nominal = compute_strategy_costs(
        dyn, player_costs, spec, strategy, op, x0, open_loop
    )

    # Build every perturbation: player ii, timestep kk < N-1, coord jj, sign.
    ii_, kk_, jj_, ss_ = jnp.meshgrid(
        jnp.arange(P),
        jnp.arange(N - 1),
        jnp.arange(um),
        jnp.array([-1.0, 1.0]),
        indexing="ij",
    )
    flat = lambda a: a.reshape(-1)
    ii_, kk_, jj_, ss_ = flat(ii_), flat(kk_), flat(jj_), flat(ss_)
    valid = spec.u_mask()[ii_, jj_] > 0  # skip padded coordinates

    def perturbed_cost(ii, kk, jj, sign):
        alphas = strategy.alphas.at[kk, ii, jj].add(sign * max_perturbation)
        pert = strategy.replace(alphas=alphas)
        costs = compute_strategy_costs(
            dyn, player_costs, spec, pert, op, x0, open_loop
        )
        return costs[ii]

    pert_costs = jax.vmap(perturbed_cost)(ii_, kk_, jj_, ss_)
    improvement = nominal[ii_] - pert_costs  # > 0 means improvement
    improvement = jnp.where(valid, improvement, -jnp.inf)
    return jnp.all(improvement <= 0.0)


def change_cost_coordinates(dyn, quad_Q, quad_l, xis):
    """Transform state Hessians/gradients from linearizing coordinates xi
    to the nonlinear state x via the chain rule (reference
    ConcatenatedFlatSystem::ChangeCostCoordinates,
    src/concatenated_flat_system.cpp:246-330, whose hand-coded Partial()
    tables are replaced by autodiff through to_linear_state):

        H_x = J^T H_xi J + sum_i g_xi[i] * Hess_x(to_linear_i)
        g_x = J^T g_xi,      with J = d to_linear / dx at x = from_linear(xi).
    """

    def one(Q, l, xi):
        x = dyn.from_linear_state(xi)
        J = jax.jacfwd(dyn.to_linear_state)(x)  # [xi_dim, x_dim]
        H2 = jax.hessian(dyn.to_linear_state)(x)  # [xi_dim, x_dim, x_dim]
        Q_x = J.T @ Q @ J + jnp.einsum("i,ixy->xy", l, H2)
        l_x = J.T @ l
        return Q_x, l_x

    # Q [N,P,x,x], l [N,P,x]: vmap over time, then players.
    return jax.vmap(
        lambda Qk, lk, xik: jax.vmap(lambda Qi, li: one(Qi, li, xik))(Qk, lk)
    )(quad_Q, quad_l, xis)


def check_sufficient_local_nash(
    player_costs, spec: GameSpec, op: OperatingPoint,
    al: pcost.ALState = None, error_margin: float = 1e-4,
    dyn=None,
) -> jnp.ndarray:
    """PSD check of all state/control Hessians along the trajectory
    (reference CheckSufficientLocalNashEquilibrium,
    src/check_local_nash_equilibrium.cpp:144-200). For flat systems pass
    `dyn` so state Hessians are transformed back to nonlinear coordinates
    before the eigenvalue check, as the reference does."""
    if al is None:
        al = pcost.ALState.init(player_costs, spec)
    _, extreme_ks = pcost.total_costs(player_costs, spec, op)
    quad = pcost.quadraticize(player_costs, spec, op, al, extreme_ks)

    Q = quad.Q
    if dyn is not None and getattr(dyn, "treat_as_linear", False)             and dyn.from_linear_state is not None:
        Q, _ = change_cost_coordinates(dyn, quad.Q, quad.l, op.xs)

    min_q = jnp.min(jnp.linalg.eigvalsh(Q))
    # Control Hessians: only (i, j) pairs with actual costs matter; absent
    # pairs are zero matrices whose eigenvalues are 0 (>= -margin), harmless.
    min_r = jnp.min(jnp.linalg.eigvalsh(quad.R))
    return (min_q >= -error_margin) & (min_r >= -error_margin)
