"""Augmented-Lagrangian outer loop around the iLQ solver.

Reference parity (src/augmented_lagrangian_solver.cpp:72-210):
  * first inner solve, then — while constraints are violated — per-timestep
    multiplier updates lambda <- max(0, lambda + mu*g) (inequalities),
    global mu <- mu * geometric_mu_scaling, warm-started inner re-solve
    (<= unconstrained_solver_max_iters iLQ iterations);
  * on inner failure: lambda and mu are scaled *down* and the warm start is
    left at the previous solution;
  * exits when max constraint value <= constraint_error_tolerance or the
    cumulative iLQ iterate budget runs out.

Multiplier state is an explicit ALState pytree, so the whole outer loop is
one jax.lax.while_loop — jittable and batchable over problem instances.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.costs.base import increment_lambda
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.solver import ilq
from ilqgames_tpu.solver.params import SolverParams
from ilqgames_tpu.types import GameSpec, OperatingPoint, Strategy

_NEG_INF = jnp.float32(-jnp.inf)


def constraint_violations(
    player_costs, spec: GameSpec, op: OperatingPoint, al: pcost.ALState
) -> Tuple[pcost.ALState, jnp.ndarray]:
    """Evaluate every constraint along the trajectory, increment the
    multipliers, and return the max raw constraint value
    (src/augmented_lagrangian_solver.cpp:114-140)."""
    ts = spec.horizon_times()
    max_violation = _NEG_INF
    new_state_lams = []
    new_control_lams = []
    for i, pc in enumerate(player_costs):
        s_lams = al.state_lambdas[i]
        for ci, con in enumerate(pc.state_constraints):
            g = jax.vmap(con.g)(ts, op.xs)  # [N]
            max_violation = jnp.maximum(max_violation, jnp.max(g))
            s_lams = s_lams.at[ci].set(
                increment_lambda(con, s_lams[ci], al.mu, g)
            )
        new_state_lams.append(s_lams)

        c_lams = al.control_lambdas[i]
        for ci, (j, con) in enumerate(pc.control_constraints):
            g = jax.vmap(con.g)(ts, op.us[:, j])
            max_violation = jnp.maximum(max_violation, jnp.max(g))
            c_lams = c_lams.at[ci].set(
                increment_lambda(con, c_lams[ci], al.mu, g)
            )
        new_control_lams.append(c_lams)

    new_al = al.replace(
        state_lambdas=tuple(new_state_lams),
        control_lambdas=tuple(new_control_lams),
    )
    return new_al, max_violation


def max_constraint_violation(player_costs, spec, op) -> jnp.ndarray:
    """Max raw g over all constraints/timesteps (no multiplier update)."""
    ts = spec.horizon_times()
    v = _NEG_INF
    for pc in player_costs:
        for con in pc.state_constraints:
            v = jnp.maximum(v, jnp.max(jax.vmap(con.g)(ts, op.xs)))
        for j, con in pc.control_constraints:
            v = jnp.maximum(v, jnp.max(jax.vmap(con.g)(ts, op.us[:, j])))
    return v


@struct.dataclass
class ALResult:
    op: OperatingPoint
    strategy: Strategy
    total_costs: jnp.ndarray
    converged: jnp.ndarray  # constraints satisfied and inner solves succeeded
    max_violation: jnp.ndarray
    cumulative_iterations: jnp.ndarray
    al_state: pcost.ALState  # final multipliers (pre-reset)


@struct.dataclass
class _ALCarry:
    al: pcost.ALState
    warm_op: OperatingPoint
    warm_strategy: Strategy
    result_op: OperatingPoint
    result_strategy: Strategy
    last_inner_success: jnp.ndarray
    success: jnp.ndarray
    max_violation: jnp.ndarray
    cum_iters: jnp.ndarray
    # Reference ILQSolver::last_merit_function_value_ persists across inner
    # solves within one AL solve (never reset between Solve() calls).
    merit: jnp.ndarray


def solve(
    dyn: dyn_base.MultiPlayerDynamics,
    player_costs,
    spec: GameSpec,
    params: SolverParams,
    x0: jnp.ndarray,
    warm_op: OperatingPoint,
    warm_strategy: Strategy,
    al_state: pcost.ALState = None,
) -> ALResult:
    """Constrained solve. Unconstrained problems fall through to one iLQ
    call with the full iteration budget."""
    constrained = pcost.is_constrained(player_costs)
    if al_state is None:
        al_state = pcost.ALState.init(player_costs, spec)

    inner_budget = (
        params.unconstrained_solver_max_iters
        if constrained
        else params.max_solver_iters
    )

    def inner_solve(al, op, strategy, last_merit=None):
        return ilq.solve(
            dyn, player_costs, spec, params, x0, op, strategy,
            al_state=al, max_iterations=inner_budget, last_merit=last_merit,
        )

    first = inner_solve(al_state, warm_op, warm_strategy)

    if not constrained:
        return ALResult(
            op=first.op,
            strategy=first.strategy,
            total_costs=first.total_costs,
            converged=first.converged & ~first.failed,
            max_violation=jnp.asarray(-jnp.inf, jnp.float32),
            cumulative_iterations=first.num_iterations,
            al_state=al_state,
        )

    init = _ALCarry(
        al=al_state,
        warm_op=first.op,
        warm_strategy=first.strategy,
        result_op=first.op,
        result_strategy=first.strategy,
        last_inner_success=~first.failed,
        success=~first.failed,
        max_violation=jnp.asarray(jnp.inf, jnp.float32),
        cum_iters=first.num_iterations,
        merit=first.merit,
    )

    def cond(c: _ALCarry):
        return (c.cum_iters < params.max_solver_iters) & (
            c.max_violation > params.constraint_error_tolerance
        )

    def body(c: _ALCarry) -> _ALCarry:
        # Multiplier update at the latest result + global mu scaling.
        al, violation = constraint_violations(
            player_costs, spec, c.result_op, c.al
        )
        al = al.replace(mu=al.mu * params.geometric_mu_scaling)

        # Warm start from the latest solution if the last inner solve
        # succeeded (augmented_lagrangian_solver.cpp:151-154).
        keep = lambda a, b: jnp.where(c.last_inner_success, a, b)
        op = jax.tree_util.tree_map(keep, c.result_op, c.warm_op)
        strategy = jax.tree_util.tree_map(
            keep, c.result_strategy, c.warm_strategy
        )

        res = inner_solve(al, op, strategy, c.merit)
        inner_ok = ~res.failed

        # On failure, downscale all multipliers (…cpp:166-178).
        def downscale(lams):
            return tuple(
                lam * params.geometric_lambda_downscaling for lam in lams
            )

        al_fail = al.replace(
            state_lambdas=downscale(al.state_lambdas),
            control_lambdas=downscale(al.control_lambdas),
            mu=al.mu * params.geometric_mu_downscaling,
        )
        pick = lambda a, b: jnp.where(inner_ok, a, b)
        al = jax.tree_util.tree_map(pick, al, al_fail)

        return _ALCarry(
            al=al,
            warm_op=op,
            warm_strategy=strategy,
            result_op=res.op,
            result_strategy=res.strategy,
            last_inner_success=inner_ok,
            success=c.success & inner_ok,
            max_violation=violation,
            cum_iters=c.cum_iters + res.num_iterations,
            merit=res.merit,
        )

    final = jax.lax.while_loop(cond, body, init)

    # Final constraint-satisfaction check (...cpp:183-188).
    final_violation = max_constraint_violation(
        player_costs, spec, final.result_op
    )
    satisfied = final_violation <= params.constraint_error_tolerance
    totals, _ = pcost.total_costs(player_costs, spec, final.result_op)

    return ALResult(
        op=final.result_op,
        strategy=final.result_strategy,
        total_costs=totals,
        converged=final.success & satisfied,
        max_violation=final_violation,
        cumulative_iterations=final.cum_iters,
        al_state=final.al,
    )


# ---------------------------------------------------------------------------
# Host-stepped batched AL driver.
# ---------------------------------------------------------------------------
def _bwhere(mask, a, b):
    """Per-instance select: mask [B] broadcast against leading batch axis."""
    m = mask.reshape(mask.shape + (1,) * (a.ndim - mask.ndim))
    return jnp.where(m, a, b)


def _tree_bwhere(mask, ta, tb):
    return jax.tree_util.tree_map(lambda a, b: _bwhere(mask, a, b), ta, tb)


def make_host_batched_solver(dyn, player_costs, spec, params,
                             warm_op=None, warm_strategy=None):
    """Batched constrained solve with the AL OUTER loop on the host.

    Identical semantics to vmap(solve) (masked per-instance updates freeze
    finished instances), but each device program is ONE AL round (multiplier
    update + inner iLQ solve + merges) instead of the whole nested
    while-in-while — measured ~4x faster per iteration on TPU (nested
    batched while_loops lower poorly), and short device programs avoid the
    TPU runtime's long-execution faults. The host only reads a single
    "any instance still active" scalar per round.

    Returns fn(x0 [B, xdim]) -> batched ALResult.
    """
    constrained = pcost.is_constrained(player_costs)
    if warm_op is None:
        warm_op = OperatingPoint.zeros(spec)
    if warm_strategy is None:
        warm_strategy = Strategy.zeros(spec)

    inner_budget = (
        params.unconstrained_solver_max_iters
        if constrained
        else params.max_solver_iters
    )

    inner_b = jax.jit(jax.vmap(
        lambda x0, al, op, st, lm: ilq.solve(
            dyn, player_costs, spec, params, x0, op, st,
            al_state=al, max_iterations=inner_budget, last_merit=lm,
        )
    ))

    def _round(x0, state):
        """One full AL outer round, batched + masked (one device program)."""
        (al_state, warm_op_b, warm_st_b, result_op, result_st,
         last_merit, inner_ok, success, cum_iters, violation) = state

        active = (cum_iters < params.max_solver_iters) & (
            violation > params.constraint_error_tolerance
        )

        def upd(al, op):
            new_al, v = constraint_violations(player_costs, spec, op, al)
            return new_al.replace(
                mu=new_al.mu * params.geometric_mu_scaling
            ), v

        new_al, violation_new = jax.vmap(upd)(al_state, result_op)
        al_state = _tree_bwhere(active, new_al, al_state)
        violation = jnp.where(active, violation_new, violation)

        warm_op_b = _tree_bwhere(inner_ok, result_op, warm_op_b)
        warm_st_b = _tree_bwhere(inner_ok, result_st, warm_st_b)

        res = jax.vmap(
            lambda x, a, o, st, lm: ilq.solve(
                dyn, player_costs, spec, params, x, o, st,
                al_state=a, max_iterations=inner_budget, last_merit=lm,
            )
        )(x0, al_state, warm_op_b, warm_st_b, last_merit)

        result_op = _tree_bwhere(active, res.op, result_op)
        result_st = _tree_bwhere(active, res.strategy, result_st)
        last_merit = jnp.where(active, res.merit, last_merit)
        inner_ok = jnp.where(active, ~res.failed, inner_ok)
        success = success & jnp.where(active, ~res.failed, True)
        cum_iters = cum_iters + jnp.where(active, res.num_iterations, 0)

        # Downscale multipliers for failed inner solves (...cpp:166-178).
        failed = active & res.failed

        def down(al, f):
            return al.replace(
                state_lambdas=tuple(
                    jnp.where(f, l * params.geometric_lambda_downscaling, l)
                    for l in al.state_lambdas
                ),
                control_lambdas=tuple(
                    jnp.where(f, l * params.geometric_lambda_downscaling, l)
                    for l in al.control_lambdas
                ),
                mu=jnp.where(f, al.mu * params.geometric_mu_downscaling,
                             al.mu),
            )

        al_state = jax.vmap(down)(al_state, failed)

        new_state = (al_state, warm_op_b, warm_st_b, result_op, result_st,
                     last_merit, inner_ok, success, cum_iters, violation)
        next_active = (cum_iters < params.max_solver_iters) & (
            violation > params.constraint_error_tolerance
        )
        return new_state, jnp.any(next_active)

    round_b = jax.jit(_round)

    viol_b = jax.jit(jax.vmap(
        lambda op: max_constraint_violation(player_costs, spec, op)
    ))
    totals_b = jax.jit(jax.vmap(
        lambda op: pcost.total_costs(player_costs, spec, op)[0]
    ))

    def run(x0_batch):
        B = x0_batch.shape[0]
        tile = lambda t: jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), t
        )
        al_state = tile(pcost.ALState.init(player_costs, spec))
        op_w = tile(warm_op)
        st_w = tile(warm_strategy)
        last_merit = jnp.full((B,), jnp.inf, jnp.float32)

        first = inner_b(x0_batch, al_state, op_w, st_w, last_merit)

        if not constrained:
            return ALResult(
                op=first.op, strategy=first.strategy,
                total_costs=first.total_costs,
                converged=first.converged & ~first.failed,
                max_violation=jnp.full((B,), -jnp.inf, jnp.float32),
                cumulative_iterations=first.num_iterations, al_state=al_state,
            )

        state = (
            al_state, first.op, first.strategy, first.op, first.strategy,
            first.merit, ~first.failed, ~first.failed,
            first.num_iterations, jnp.full((B,), jnp.inf, jnp.float32),
        )
        import os as _os
        import time as _time
        _dbg = bool(_os.environ.get("ILQGAMES_DEBUG_TIMING"))
        any_active = jnp.asarray(True)
        rounds = 0
        while bool(any_active):
            _t0 = _time.perf_counter()
            state, any_active = round_b(x0_batch, state)
            if _dbg:
                any_active.block_until_ready()
                print(f"[al] round {rounds}: "
                      f"{_time.perf_counter() - _t0:.2f}s", flush=True)
            rounds += 1

        (al_state, _, _, result_op, result_st,
         last_merit, inner_ok, success, cum_iters, violation) = state
        fv = viol_b(result_op)
        satisfied = fv <= params.constraint_error_tolerance
        return ALResult(
            op=result_op, strategy=result_st,
            total_costs=totals_b(result_op),
            converged=success & satisfied, max_violation=fv,
            cumulative_iterations=cum_iters, al_state=al_state,
        )

    return run
