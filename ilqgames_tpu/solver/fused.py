"""Fused AL + iLQ solver: a flat per-lane state machine.

Semantics identical to solver/al.py's outer loop wrapped around
solver/ilq.py's inner loop (validated against them), but flattened into
ONE while_loop whose body advances every lane by exactly one iLQ
iteration; augmented-Lagrangian bookkeeping (multiplier updates, mu
scaling, warm-start swaps, inner re-initialization) fires per-lane at
inner-solve boundaries via masked updates.

Why: under vmap, nested loops synchronize to the slowest lane at EVERY
level. With diverse instances, lanes whose inner solves bail after one
iteration (a linesearch failure under the carried merit) advance their
100-iteration budget one step per outer round while paying for the
slowest lane's full 10 — measured 89 rounds x 1.8 s at batch 64 where
~11 were expected. In the flat machine every trip is one productive
iteration for every unfinished lane, so total trips ~= the iteration
budget regardless of how lanes' inner solves fragment.

Iteration accounting matches solver/al.py (cumulative accepted/attempted
iLQ iterations; the reference counts logged iterates, which adds one per
inner solve for the initial rollout — see al.solve's docstring).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.solver import ilq
from ilqgames_tpu.solver.al import ALResult, constraint_violations, \
    max_constraint_violation
from ilqgames_tpu.solver.params import SolverParams
from ilqgames_tpu.types import GameSpec, OperatingPoint, QuadraticCosts, Strategy


@struct.dataclass
class _FusedCarry:
    c: ilq._SolveCarry  # inner iLQ iteration state
    al: pcost.ALState
    warm_op: OperatingPoint
    warm_strategy: Strategy
    inner_iters: jnp.ndarray  # iterations inside the current inner solve
    cum_iters: jnp.ndarray
    violation: jnp.ndarray  # latest boundary violation (inf before first)
    success: jnp.ndarray  # all inner solves so far succeeded
    done: jnp.ndarray


def _init_inner(dyn, player_costs, spec, x0, op, strategy, al, last_merit):
    """ILQSolver::Solve initialization (src/ilq_solver.cpp:82-121)."""
    last_op = op.replace(xs=op.xs.at[0].set(x0))
    current_op = dyn_base.rollout(dyn, spec, x0, last_op, strategy)
    _, extreme_ks = pcost.total_costs(player_costs, spec, current_op)
    quad = pcost.quadraticize(player_costs, spec, current_op, al, extreme_ks)
    return ilq._SolveCarry(
        op=current_op, strategy=strategy, quad=quad, extreme_ks=extreme_ks,
        last_merit=last_merit, iteration=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(False), failed=jnp.asarray(False),
    )


def _trip(dyn, player_costs, spec, params, x0, fc):
    """One trip of the flat machine: one iLQ iteration + masked boundary
    bookkeeping."""
    # --- one iLQ iteration with the lane's current multipliers ---
    c2 = ilq.iteration_step(
        dyn, player_costs, spec, params, x0, fc.al, fc.c
    )
    inner_iters = fc.inner_iters + 1
    cum_iters = fc.cum_iters + 1
    inner_budget = params.unconstrained_solver_max_iters
    inner_end = c2.converged | c2.failed | (inner_iters >= inner_budget)
    inner_ok = ~c2.failed

    # --- boundary bookkeeping (masked; only real at inner_end) ---
    # Violation + incremented multipliers at the inner result
    # (src/augmented_lagrangian_solver.cpp:114-143). On inner failure
    # the reference FIRST downscales lambda/mu (:166-178), and the
    # increment at the next round start then uses the downscaled mu.
    al_pre = jax.tree_util.tree_map(lambda a: a, fc.al)
    down = lambda lam: lam * params.geometric_lambda_downscaling
    al_failed = al_pre.replace(
        state_lambdas=tuple(down(l) for l in al_pre.state_lambdas),
        control_lambdas=tuple(down(l) for l in al_pre.control_lambdas),
        mu=al_pre.mu * params.geometric_mu_downscaling,
    )
    pick_fail = lambda a, b: jnp.where(c2.failed, a, b)
    al_base = jax.tree_util.tree_map(pick_fail, al_failed, al_pre)

    al_inc, violation_new = constraint_violations(
        player_costs, spec, c2.op, al_base
    )
    al_inc = al_inc.replace(mu=al_inc.mu * params.geometric_mu_scaling)

    # The reference checks the PREVIOUS round's violation in the loop
    # condition and only measures a new one inside the body — so
    # satisfaction is always discovered one inner solve late
    # (src/augmented_lagrangian_solver.cpp:108-143). Matched here by
    # gating on the carried violation, initialized to +inf.
    continuing = (cum_iters < params.max_solver_iters) & (
        fc.violation > params.constraint_error_tolerance
    )
    done_now = inner_end & ~continuing

    # Warm start advances only after successful inner solves
    # (augmented_lagrangian_solver.cpp:151-154).
    adv = inner_end & inner_ok
    keep_warm = lambda a, b: jnp.where(adv, a, b)
    warm_op = jax.tree_util.tree_map(keep_warm, c2.op, fc.warm_op)
    warm_strategy = jax.tree_util.tree_map(
        keep_warm, c2.strategy, fc.warm_strategy
    )

    # Next inner's starting iterate: the warm start (== c2.op when the
    # inner succeeded; the previous warm start when it failed).
    c3 = _init_inner(dyn, player_costs, spec, x0, warm_op,
                     warm_strategy, al_inc, c2.last_merit)

    reinit = inner_end & continuing
    pick_r = lambda a, b: jnp.where(reinit, a, b)
    c_next = jax.tree_util.tree_map(pick_r, c3, c2)
    al_next = jax.tree_util.tree_map(
        pick_r, al_inc,
        jax.tree_util.tree_map(pick_fail, al_failed, fc.al),
    )

    return _FusedCarry(
        c=c_next,
        al=al_next,
        warm_op=warm_op,
        warm_strategy=warm_strategy,
        inner_iters=jnp.where(reinit, 0, inner_iters),
        cum_iters=cum_iters,
        violation=jnp.where(reinit, violation_new, fc.violation),
        success=fc.success & jnp.where(inner_end, inner_ok, True),
        done=fc.done | done_now,
    )



def solve(
    dyn,
    player_costs,
    spec: GameSpec,
    params: SolverParams,
    x0: jnp.ndarray,
    warm_op: OperatingPoint,
    warm_strategy: Strategy,
    al_state: Optional[pcost.ALState] = None,
) -> ALResult:
    """Constrained solve with the flat AL+iLQ machine (one lane; vmap for
    batches). Unconstrained problems delegate to plain ilq.solve."""
    constrained = pcost.is_constrained(player_costs)
    if al_state is None:
        al_state = pcost.ALState.init(player_costs, spec)

    if not constrained:
        res = ilq.solve(
            dyn, player_costs, spec, params, x0, warm_op, warm_strategy,
            al_state=al_state, max_iterations=params.max_solver_iters,
        )
        return ALResult(
            op=res.op, strategy=res.strategy, total_costs=res.total_costs,
            converged=res.converged & ~res.failed,
            max_violation=jnp.asarray(-jnp.inf, jnp.float32),
            cumulative_iterations=res.num_iterations, al_state=al_state,
        )

    inner_budget = params.unconstrained_solver_max_iters

    def init_inner(op, strategy, al, last_merit):
        """ILQSolver::Solve initialization (src/ilq_solver.cpp:82-121):
        rollout from the warm start (a no-op when op already starts at x0
        under its own strategies, which holds throughout the AL loop) and
        quadraticize at the current multipliers."""
        last_op = op.replace(xs=op.xs.at[0].set(x0))
        current_op = dyn_base.rollout(dyn, spec, x0, last_op, strategy)
        _, extreme_ks = pcost.total_costs(player_costs, spec, current_op)
        quad = pcost.quadraticize(
            player_costs, spec, current_op, al, extreme_ks
        )
        return ilq._SolveCarry(
            op=current_op,
            strategy=strategy,
            quad=quad,
            extreme_ks=extreme_ks,
            last_merit=last_merit,
            iteration=jnp.asarray(0, jnp.int32),
            converged=jnp.asarray(False),
            failed=jnp.asarray(False),
        )

    c0 = init_inner(warm_op, warm_strategy, al_state,
                    jnp.asarray(jnp.inf, jnp.float32))
    fc0 = _FusedCarry(
        c=c0,
        al=al_state,
        warm_op=c0.op,
        warm_strategy=c0.strategy,
        inner_iters=jnp.asarray(0, jnp.int32),
        cum_iters=jnp.asarray(0, jnp.int32),
        violation=jnp.asarray(jnp.inf, jnp.float32),
        success=jnp.asarray(True),
        done=jnp.asarray(False),
    )

    def cond(fc: _FusedCarry):
        return ~fc.done

    def trip(fc: _FusedCarry) -> _FusedCarry:
        return _trip(dyn, player_costs, spec, params, x0, fc)

    final = jax.lax.while_loop(cond, trip, fc0)

    # Final constraint check at the result (al.solve parity).
    fv = max_constraint_violation(player_costs, spec, final.c.op)
    satisfied = fv <= params.constraint_error_tolerance
    totals, _ = pcost.total_costs(player_costs, spec, final.c.op)
    return ALResult(
        op=final.c.op,
        strategy=final.c.strategy,
        total_costs=totals,
        converged=final.success & satisfied,
        max_violation=fv,
        cumulative_iterations=final.cum_iters,
        al_state=final.al,
    )


def make_host_batched_solver(dyn, player_costs, spec, params,
                             warm_op=None, warm_strategy=None,
                             trips_per_call: int = 25):
    """Batched fused solve with bounded device programs: each dispatch runs
    `trips_per_call` masked trips of the flat machine for the whole batch,
    and the host loops until every lane is done. Keeps single device
    programs short (the TPU runtime faults on very long executions) while
    preserving the flat machine's no-straggler-amplification property.

    Returns fn(x0 [B, xdim]) -> batched ALResult. Unconstrained problems
    fall through to one vmapped iLQ solve."""
    constrained = pcost.is_constrained(player_costs)
    if warm_op is None:
        warm_op = OperatingPoint.zeros(spec)
    if warm_strategy is None:
        warm_strategy = Strategy.zeros(spec)

    if not constrained:
        solve_b = jax.jit(jax.vmap(
            lambda x: solve(dyn, player_costs, spec, params, x,
                            warm_op, warm_strategy)
        ))
        return solve_b

    al0 = pcost.ALState.init(player_costs, spec)

    def init_one(x0):
        last_op = warm_op.replace(xs=warm_op.xs.at[0].set(x0))
        current_op = dyn_base.rollout(dyn, spec, x0, last_op, warm_strategy)
        _, extreme_ks = pcost.total_costs(player_costs, spec, current_op)
        quad = pcost.quadraticize(
            player_costs, spec, current_op, al0, extreme_ks
        )
        c0 = ilq._SolveCarry(
            op=current_op, strategy=warm_strategy, quad=quad,
            extreme_ks=extreme_ks,
            last_merit=jnp.asarray(jnp.inf, jnp.float32),
            iteration=jnp.asarray(0, jnp.int32),
            converged=jnp.asarray(False), failed=jnp.asarray(False),
        )
        return _FusedCarry(
            c=c0, al=al0, warm_op=c0.op, warm_strategy=c0.strategy,
            inner_iters=jnp.asarray(0, jnp.int32),
            cum_iters=jnp.asarray(0, jnp.int32),
            violation=jnp.asarray(jnp.inf, jnp.float32),
            success=jnp.asarray(True), done=jnp.asarray(False),
        )

    def trip_one(x0, fc):
        fc2 = _trip(dyn, player_costs, spec, params, x0, fc)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(fc.done, a, b), fc, fc2
        )

    def steps_one(x0, fc):
        def body(fc, _):
            return trip_one(x0, fc), None

        fc, _ = jax.lax.scan(body, fc, None, length=trips_per_call)
        return fc

    init_b = jax.jit(jax.vmap(init_one))
    steps_b = jax.jit(jax.vmap(steps_one))

    def finalize_one(fc):
        fv = max_constraint_violation(player_costs, spec, fc.c.op)
        totals, _ = pcost.total_costs(player_costs, spec, fc.c.op)
        return ALResult(
            op=fc.c.op, strategy=fc.c.strategy, total_costs=totals,
            converged=fc.success & (fv <= params.constraint_error_tolerance),
            max_violation=fv, cumulative_iterations=fc.cum_iters,
            al_state=fc.al,
        )

    finalize_b = jax.jit(jax.vmap(finalize_one))
    all_done = jax.jit(lambda fc: jnp.all(fc.done))

    def run(x0_batch):
        fc = init_b(x0_batch)
        while not bool(all_done(fc)):
            fc = steps_b(x0_batch, fc)
        return finalize_b(fc)

    return run
