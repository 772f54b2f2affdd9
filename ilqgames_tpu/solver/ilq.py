"""The iterative LQ game solver: one jitted, batchable `solve` function.

Reference parity (src/ilq_solver.cpp:76-492):
  1. forward rollout of the joint dynamics under the current affine
     strategies (CurrentOperatingPoint, :174-206);
  2. quadraticize all players' costs along the trajectory (:471-490);
  3. linearize dynamics (:437-455; constant for flat systems);
  4. solve the time-varying coupled LQ game (feedback or open-loop kernel);
  5. Armijo-backtracking linesearch on the affine terms with the merit
     function 0.5*||stage gradients||^2 re-quadraticized at every trial
     point (:289-435) — the costate terms of the merit are omitted exactly
     as in the shipped code (:384-393, :421-428);
  6. converged when the merit decreased and the decrease is below tolerance
     (solver/ilq_solver.h:126-130).

TPU design: the whole solve is a jax.lax.while_loop over iterations;
the backtracking linesearch is PARALLEL, unlike the reference's sequential
loop: all candidate step sizes are rolled out and merit-evaluated at once
(gradient-only merits -- no Hessians), and the first Armijo-passing
candidate is selected, which is exactly the reference's accept rule with
~100x less sequential depth (the right trade on TPU, where the extra
width is free and latency is the bottleneck). Everything vmaps over a
leading batch of problem instances. No Python-level control flow depends
on traced values.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.solver.lq_feedback import solve_lq_feedback
from ilqgames_tpu.solver.lq_open_loop import solve_lq_open_loop
from ilqgames_tpu.solver.params import SolverParams
from ilqgames_tpu.types import (
    scan_unroll,
    GameSpec,
    LinearDynamics,
    OperatingPoint,
    QuadraticCosts,
    Strategy,
)

_INF = jnp.float32(jnp.inf)


@struct.dataclass
class ILQResult:
    op: OperatingPoint
    strategy: Strategy
    total_costs: jnp.ndarray  # [P]
    extreme_ks: jnp.ndarray  # [P] int32
    converged: jnp.ndarray  # bool
    failed: jnp.ndarray  # bool (linesearch failure)
    num_iterations: jnp.ndarray  # int32
    merit: jnp.ndarray  # final merit function value
    quad: QuadraticCosts  # quadraticization at the final operating point
    # When record_history: per-iteration (op, strategy, merit, converged,
    # failed, active) stacked along axis 0; else None.
    history: Optional[tuple] = None


def _merit(spec: GameSpec, quad: QuadraticCosts) -> jnp.ndarray:
    """0.5 * sum of squared stage gradients: own-control gradients at every
    knot, state gradients at k >= 1 (MeritFunction, src/ilq_solver.cpp:404-435)."""
    r_ii = jnp.einsum("kiiu->kiu", quad.r)  # [N, P, umax]
    control_term = jnp.sum(r_ii * r_ii)
    state_term = jnp.sum(quad.l[1:] * quad.l[1:])
    return 0.5 * (control_term + state_term)


def _expected_decrease(
    spec: GameSpec, quad: QuadraticCosts, alphas: jnp.ndarray,
    delta_xs: jnp.ndarray
) -> jnp.ndarray:
    """ExpectedDecrease (src/ilq_solver.cpp:364-398), shipped form: costate
    contributions omitted; uses the *unscaled* LQ alphas and delta_xs."""
    R_ii = jnp.einsum("kiiuv->kiuv", quad.R)  # [N, P, u, u]
    r_ii = jnp.einsum("kiiu->kiu", quad.r)  # [N, P, u]
    control = -jnp.einsum("kiu,kiuv,kiv->", alphas, R_ii, r_ii)
    state = -jnp.einsum("kx,kixy,kiy->", delta_xs[1:], quad.Q[1:], quad.l[1:])
    return control + state




def sweep_merits_scan(
    dyn, player_costs, spec, x0, last_op, strategy, scals, al_state,
    extreme_gate,
):
    """One tranche of the fused merit sweep: one scan over time advances
    every candidate stepsize in `scals` ([chunk]) and accumulates its
    gradient-only merit (the parallel form of the reference's sequential
    Armijo backtracking, src/ilq_solver.cpp:289-435). Module-level so the
    Pallas sweep kernel (ops/pallas/sweep.py) can be parity-tested and the
    batched solver can reuse it. Returns merits [chunk]."""
    u_mask = spec.u_mask()
    ks_all = jnp.arange(spec.num_time_steps)
    chunk = scals.shape[0]

    def sweep_step(carry, inputs):
        xs_c, merit_c = carry  # [chunk, xdim], [chunk]
        k, x_ref, u_ref, P_ref, alpha = inputs

        def one(x_k, s, m):
            delta = x_k - x_ref
            us = (
                u_ref
                - jnp.einsum("pux,x->pu", P_ref, delta)
                - s * alpha
            ) * u_mask
            t = last_op.t0 + k.astype(jnp.float32) * spec.dt
            l_k, r_k = pcost.stage_gradients(
                player_costs, spec, al_state, k, t, x_k, us
            )
            l_k = l_k * extreme_gate[k][:, None]
            state_term = jnp.where(k > 0, jnp.sum(l_k * l_k), 0.0)
            m_new = m + jnp.sum(r_k * r_k) + state_term
            x_next = dyn_base.integrate(dyn, t, spec.dt, x_k, us)
            return x_next, m_new

        xs_c, merit_c = jax.vmap(one)(xs_c, scals, merit_c)
        return (xs_c, merit_c), None

    xs0 = jnp.tile(x0[None], (chunk, 1))
    merit0 = jnp.zeros((chunk,), jnp.float32)
    (_, merit_sums), _ = jax.lax.scan(
        sweep_step,
        (xs0, merit0),
        (ks_all, last_op.xs, last_op.us, strategy.Ps, strategy.alphas),
    )
    return 0.5 * merit_sums


@struct.dataclass
class _SolveCarry:
    op: OperatingPoint
    strategy: Strategy
    quad: QuadraticCosts
    extreme_ks: jnp.ndarray
    last_merit: jnp.ndarray
    iteration: jnp.ndarray
    converged: jnp.ndarray
    failed: jnp.ndarray


def iteration_step(dyn, player_costs, spec, params, x0, al_state, c):
    """ONE iLQ iteration: linearize, solve the LQ game, parallel-linesearch,
    accept/revert (the body of ILQSolver::Solve's main loop,
    src/ilq_solver.cpp:123-165). Exposed at module level so the fused
    AL+iLQ state machine (solver/fused.py) can drive it with a traced,
    per-lane ALState."""
    lin = dyn_base.linearize(dyn, spec, c.op)
    if params.open_loop:
        lqsol = solve_lq_open_loop(spec, lin, c.quad, x0 - c.op.xs[0])
    else:
        lqsol = solve_lq_feedback(
            spec, lin, c.quad, x0 - c.op.xs[0],
            adaptive_regularization=params.adaptive_regularization,
        )

    # --- ModifyLQStrategies (src/ilq_solver.cpp:289-348) ---
    expected_decrease = _expected_decrease(
        spec, c.quad, lqsol.strategy.alphas, lqsol.delta_xs
    )
    last_op = c.op

    if not params.linesearch:
        scaled = lqsol.strategy.scale_alphas(params.initial_alpha_scaling)
        trial_op = dyn_base.rollout(dyn, spec, x0, last_op, scaled)
        totals, extreme_ks = pcost.total_costs(player_costs, spec, trial_op)
        quad = pcost.quadraticize(player_costs, spec, trial_op, al_state, extreme_ks)
        return c.replace(
            op=trial_op,
            strategy=scaled,
            quad=quad,
            extreme_ks=extreme_ks,
            iteration=c.iteration + 1,
        )

    # --- PARALLEL linesearch: every candidate stepsize at once. The
    # reference tries initial, initial*g, initial*g^2, ... sequentially
    # and accepts the first Armijo pass (src/ilq_solver.cpp:325-343);
    # evaluating the whole geometric ladder in parallel and selecting
    # the first passing index is the same rule, and merit needs only
    # stage GRADIENTS, not full quadraticizations.
    n_cand = params.max_backtracking_steps
    scalings = params.initial_alpha_scaling * (
        params.geometric_alpha_scaling
        ** jnp.arange(n_cand, dtype=jnp.float32)
    )

    # Fused sweep in TRANCHES: candidates are evaluated `chunk` at a
    # time (one scan over time advances all candidates in the tranche
    # and accumulates gradient-only merits in the carry); tranches stop
    # as soon as one contains an Armijo pass. Typical iterations accept
    # in the first tranche, so the compute matches the reference's lazy
    # sequential search while keeping its sequential depth ~chunk x
    # smaller. Worst case degrades to ceil(n_cand/chunk) sequential
    # sweeps — the reference's n_cand rollouts, chunked.
    u_mask = spec.u_mask()
    extreme_gate = jnp.ones((spec.num_time_steps, spec.num_players),
                            jnp.float32)
    ks_all = jnp.arange(spec.num_time_steps)
    for _i, _pc in enumerate(player_costs):
        if _pc.structure != pcost.STRUCTURE_SUM:
            extreme_gate = extreme_gate.at[:, _i].set(
                (ks_all == c.extreme_ks[_i]).astype(jnp.float32)
            )

    chunk = min(params.linesearch_chunk, n_cand)
    n_tranche = -(-n_cand // chunk)  # ceil
    # Pad the ladder so every tranche has `chunk` entries; padding
    # repeats the smallest stepsize (harmless: selection is first-wins
    # over the REAL indices only, via validity masking).
    pad = n_tranche * chunk - n_cand
    scal_pad = jnp.concatenate(
        [scalings, jnp.full((pad,), scalings[-1], jnp.float32)]
    ).reshape(n_tranche, chunk)
    valid = (jnp.arange(n_tranche * chunk) < n_cand).reshape(
        n_tranche, chunk
    )

    def tranche_merits(scals):
        return sweep_merits_scan(
            dyn, player_costs, spec, x0, last_op, lqsol.strategy, scals,
            al_state, extreme_gate,
        )

    def tr_cond(tc):
        t_idx, found, _, _ = tc
        return (t_idx < n_tranche) & ~found

    def tr_body(tc):
        t_idx, _, _, _ = tc
        scals = scal_pad[t_idx]
        merits_t = tranche_merits(scals)
        # Armijo per candidate (src/ilq_solver.cpp:350-362).
        ok = ((c.last_merit - merits_t)
              >= params.expected_decrease_fraction * scals
              * expected_decrease) & valid[t_idx]
        found = jnp.any(ok)
        local = jnp.argmax(ok)  # first pass within the tranche
        return (t_idx + 1, found, scals[local], merits_t[local])

    _, passed, scal_sel, merit_sel = jax.lax.while_loop(
        tr_cond, tr_body,
        (jnp.asarray(0, jnp.int32), jnp.asarray(False),
         scalings[0], c.last_merit),
    )

    strategy_sel = lqsol.strategy.scale_alphas(scal_sel)
    # Re-roll the selected candidate once (cheaper than materializing
    # every candidate's trajectory during the sweep).
    op_sel = dyn_base.rollout(dyn, spec, x0, last_op, strategy_sel)
    # One full quadraticization at the accepted iterate (the reference
    # retains the one computed inside MeritFunction; same values).
    quad_sel = pcost.quadraticize(player_costs, spec, op_sel, al_state, c.extreme_ks)

    failed = ~passed  # no candidate satisfied Armijo
    converged = passed & (merit_sel <= c.last_merit) & (
        jnp.abs(c.last_merit - merit_sel) < params.convergence_tolerance
    )
    totals, extreme_ks = pcost.total_costs(player_costs, spec, op_sel)
    # On linesearch failure the reference reverts to the last accepted
    # iterate (its log never records the failed trial,
    # src/ilq_solver.cpp:146-155).
    accept = lambda a, b: jnp.where(passed, a, b)
    return _SolveCarry(
        op=jax.tree_util.tree_map(accept, op_sel, c.op),
        strategy=jax.tree_util.tree_map(accept, strategy_sel, c.strategy),
        quad=jax.tree_util.tree_map(accept, quad_sel, c.quad),
        extreme_ks=accept(extreme_ks, c.extreme_ks),
        last_merit=accept(merit_sel, c.last_merit),
        iteration=c.iteration + 1,
        converged=converged,
        failed=failed,
    )



def solve(
    dyn: dyn_base.MultiPlayerDynamics,
    player_costs: Tuple[pcost.PlayerCost, ...],
    spec: GameSpec,
    params: SolverParams,
    x0: jnp.ndarray,
    warm_op: OperatingPoint,
    warm_strategy: Strategy,
    al_state: Optional[pcost.ALState] = None,
    max_iterations: Optional[int] = None,
    last_merit: Optional[jnp.ndarray] = None,
    record_history: bool = False,
) -> ILQResult:
    """Run the iLQ game solver from a warm start.

    All arguments after `params` are traced; vmap over a leading batch axis
    of (x0, warm_op, warm_strategy, al_state) for batched solving.

    `last_merit` carries the merit value across successive inner solves in
    the AL outer loop, matching the reference's persistent
    `last_merit_function_value_` member (solver/ilq_solver.h) which is
    never reset between Solve() calls.
    """
    if al_state is None:
        al_state = pcost.ALState.init(player_costs, spec)
    max_iters = (
        params.max_solver_iters if max_iterations is None else max_iterations
    )

    def lq_solve(lin: LinearDynamics, quad: QuadraticCosts, dx0):
        if params.open_loop:
            return solve_lq_open_loop(spec, lin, quad, dx0)
        return solve_lq_feedback(
            spec, lin, quad, dx0,
            adaptive_regularization=params.adaptive_regularization,
        )

    def quadraticize(op, extreme_ks):
        return pcost.quadraticize(player_costs, spec, op, al_state, extreme_ks)

    # --- initialization (src/ilq_solver.cpp:82-121) ---
    last_op = warm_op.replace(xs=warm_op.xs.at[0].set(x0))
    current_op = dyn_base.rollout(dyn, spec, x0, last_op, warm_strategy)
    totals0, extreme_ks0 = pcost.total_costs(player_costs, spec, current_op)
    quad0 = quadraticize(current_op, extreme_ks0)

    init = _SolveCarry(
        op=current_op,
        strategy=warm_strategy,
        quad=quad0,
        extreme_ks=extreme_ks0,
        last_merit=_INF if last_merit is None else last_merit,
        iteration=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(False),
        failed=jnp.asarray(False),
    )

    def cond(c: _SolveCarry):
        return (c.iteration < max_iters) & ~c.converged & ~c.failed

    def body(c: _SolveCarry) -> _SolveCarry:
        return iteration_step(dyn, player_costs, spec, params, x0, al_state, c)

    if record_history:
        # Fixed-trip-count scan with post-convergence masking: identical
        # per-iteration math, but every iterate is recorded (the reference
        # SolverLog keeps the full history; utils/solver_log.h:58-140).
        def scan_body(c, _):
            active = cond(c)
            c2 = body(c)
            c_new = jax.tree_util.tree_map(
                lambda a, b: jnp.where(active, a, b), c2, c
            )
            rec = (c_new.op, c_new.strategy, c_new.last_merit,
                   c_new.converged, c_new.failed, active)
            return c_new, rec

        final, history = jax.lax.scan(scan_body, init, None, length=max_iters)
    else:
        final = jax.lax.while_loop(cond, body, init)
        history = None
    totals, _ = pcost.total_costs(player_costs, spec, final.op)
    return ILQResult(
        op=final.op,
        strategy=final.strategy,
        total_costs=totals,
        extreme_ks=final.extreme_ks,
        converged=final.converged,
        failed=final.failed,
        num_iterations=final.iteration,
        merit=final.last_merit,
        quad=final.quad,
        history=history,
    )
