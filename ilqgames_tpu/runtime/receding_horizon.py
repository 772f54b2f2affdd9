"""Receding-horizon runtime: warm-start shifting, solution splicing, and a
fixed-cadence replanning simulator.

Reference parity (capability, not design):
  - Problem::SyncToExistingProblem / SetUpNextRecedingHorizon
    (src/problem.cpp:64-186): integrate the true state forward by the
    planner budget along the current plan, find the nearest plan state,
    stitch (ego from plan, others from reality), left-shift the operating
    point/strategies, zero-pad the tail and propagate tail states.
  - SolutionSplicer (src/solution_splicer.cpp:56-130): keep <= 5 past
    steps for a low-level follower, overwrite the future with each newly
    converged solution.
  - RecedingHorizonSimulator (src/receding_horizon_simulator.cpp:65-139):
    replan every 0.25 s of sim time over a 10 s episode.

TPU-native redesign: everything here is pure array ops with static
shapes, so a whole receding-horizon *simulation step* jits and vmaps —
thousands of receding-horizon agents replan in lockstep on one chip
(BASELINE config 5). Wall-clock anytime budgets become fixed iteration
budgets: the simulator models the planner as consuming exactly
`planner_time` of sim time per replan, which is the deployment contract
the reference asserts (CHECK_LE(elapsed, planner_runtime),
src/receding_horizon_simulator.cpp:119).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.problem import Problem
from ilqgames_tpu.solver import al as al_solver
from ilqgames_tpu.solver.params import SolverParams
from ilqgames_tpu.types import GameSpec, OperatingPoint, Strategy, SMALL_NUMBER

# Number of past steps the splicer retains for a low-level path follower
# (src/solution_splicer.cpp:71).
NUM_PREVIOUS_STEPS_TO_SAVE = 5


# ---------------------------------------------------------------------------
# Plan playback: integrate the true state along the current plan.
# ---------------------------------------------------------------------------
def _controls_at(
    spec: GameSpec, op: OperatingPoint, strategy: Strategy, k, x, x_ref
):
    """u_i = u_ref_i(k) - P_i[k](x - x_ref) - alpha_i[k], masked."""
    u_mask = spec.u_mask()
    delta = x - x_ref
    return (
        op.us[k] - jnp.einsum("pux,x->pu", strategy.Ps[k], delta)
        - strategy.alphas[k]
    ) * u_mask


def integrate_to_next_time_step(
    dyn, spec: GameSpec, op: OperatingPoint, strategy: Strategy, t0, x0
):
    """Partial step from absolute time t0 to the next grid knot
    (src/multi_player_integrable_system.cpp:107-137). Returns (x, t)."""
    rel = t0 - op.t0
    k = jnp.floor((rel + SMALL_NUMBER) / spec.dt).astype(jnp.int32)
    remaining = spec.dt * (k + 1).astype(jnp.float32) - rel

    frac = remaining / spec.dt
    N = spec.num_time_steps
    x_next_ref = op.xs[jnp.minimum(k + 1, N - 1)]
    x_ref = jnp.where(
        k + 1 < N, frac * op.xs[k] + (1.0 - frac) * x_next_ref, op.xs[N - 1]
    )
    us = _controls_at(spec, op, strategy, k, x0, x_ref)
    # Partial-interval RK4 (2 substeps over `remaining`).
    x = _rk4_span(dyn, t0, remaining, x0, us)
    return x, t0 + remaining


def _rk4_span(dyn, t, span, x, us, num_substeps: int = 2):
    """RK4 with 2 substeps over an arbitrary (traced) interval, matching
    the reference integrator's structure for partial steps."""
    h = span / num_substeps
    for i in range(num_substeps):
        ts = t + i * h
        k1 = h * dyn.ode(ts, x, us)
        k2 = h * dyn.ode(ts + 0.5 * h, x + 0.5 * k1, us)
        k3 = h * dyn.ode(ts + 0.5 * h, x + 0.5 * k2, us)
        k4 = h * dyn.ode(ts + h, x + k3, us)
        x = x + (k1 + 2.0 * (k2 + k3) + k4) / 6.0
    return x


def integrate_span(
    dyn,
    spec: GameSpec,
    op: OperatingPoint,
    strategy: Strategy,
    t_from,
    t_to,
    x,
    max_steps: int,
):
    """Play the plan back from absolute t_from to t_to starting at state x
    (reference MultiPlayerIntegrableSystem::Integrate(t0, t, ...) chaining
    IntegrateToNextTimeStep + full steps + IntegrateFromPriorTimeStep).
    `max_steps` is the static bound on the number of full grid steps."""
    # Partial step up to the grid.
    x, t = integrate_to_next_time_step(dyn, spec, op, strategy, t_from, x)
    t = jnp.minimum(t, t_to)

    # Full grid steps while t + dt <= t_to (statically bounded, masked).
    def step(carry, _):
        x, t = carry
        k = jnp.floor((t - op.t0 + SMALL_NUMBER) / spec.dt).astype(jnp.int32)
        k = jnp.minimum(k, spec.num_time_steps - 1)
        us = _controls_at(spec, op, strategy, k, x, op.xs[k])
        x_new = dyn_base.integrate(dyn, t, spec.dt, x, us)
        take = t + spec.dt <= t_to + SMALL_NUMBER
        x = jnp.where(take, x_new, x)
        t = jnp.where(take, t + spec.dt, t)
        return (x, t), None

    (x, t), _ = jax.lax.scan(step, (x, t), None, length=max_steps)

    # Final partial step to exactly t_to.
    k = jnp.floor((t - op.t0 + SMALL_NUMBER) / spec.dt).astype(jnp.int32)
    k = jnp.minimum(k, spec.num_time_steps - 1)
    us = _controls_at(spec, op, strategy, k, x, op.xs[k])
    span = jnp.maximum(t_to - t, 0.0)
    x = _rk4_span(dyn, t, span, x, us)
    return x


# ---------------------------------------------------------------------------
# Warm-start shift (SetUpNextRecedingHorizon).
# ---------------------------------------------------------------------------
def setup_next_receding_horizon(
    dyn,
    spec: GameSpec,
    op: OperatingPoint,
    strategy: Strategy,
    x0,
    t0,
    planner_time: float,
):
    """Pure-array version of Problem::SetUpNextRecedingHorizon
    (src/problem.cpp:64-186). Returns (new_op, new_strategy, new_x0).

    new_op.t0 lands within one dt of t0 + planner_time (the reference's
    invariant, src/problem.cpp:124)."""
    N = spec.num_time_steps
    dt = spec.dt

    # --- SyncToExistingProblem (:64-125) ---
    rel = t0 - op.t0
    k_cur = jnp.floor(rel / dt).astype(jnp.int32)
    remaining = dt * (k_cur + 1).astype(jnp.float32) - rel
    bump = remaining < 0.9 * dt
    k_cur = jnp.where(bump, k_cur + 1, k_cur)
    remaining = jnp.where(bump, dt - remaining, remaining)

    x, _ = integrate_to_next_time_step(dyn, spec, op, strategy, t0, x0)
    new_t0 = t0 + remaining

    n_full = jnp.where(
        remaining <= planner_time,
        ((planner_time - remaining) / dt + SMALL_NUMBER).astype(jnp.int32),
        0,
    )
    max_full = int(planner_time / dt) + 1

    def step(carry, i):
        x, k = carry
        kk = jnp.minimum(k, N - 1)
        us = _controls_at(spec, op, strategy, kk, x, op.xs[kk])
        x_new = dyn_base.integrate(dyn, op.t0 + kk.astype(jnp.float32) * dt,
                                   dt, x, us)
        take = i < n_full
        return (jnp.where(take, x_new, x), jnp.where(take, k + 1, k)), None

    (x, _), _ = jax.lax.scan(
        step, (x, k_cur + 1), jnp.arange(max_full)
    )
    new_t0 = new_t0 + dt * n_full.astype(jnp.float32)

    # Nearest plan state by ego-position distance (the reference's
    # ConcatenatedDynamicalSystem::DistanceBetween uses the ego subsystem
    # only — a documented HACK, src/concatenated_dynamical_system.cpp:109-117).
    pos = jnp.asarray(dyn.position_dims[0], jnp.int32) if dyn.position_dims \
        else jnp.arange(min(2, spec.xdim))
    d = jnp.sum((op.xs[:, pos] - x[pos]) ** 2, axis=-1)
    shift = jnp.argmin(d).astype(jnp.int32)

    # Stitch: ego sub-state from the PLAN's nearest state, other players'
    # from the integrated true state (src/problem.cpp:117, Stitch's first
    # arg is "best for ego").
    ego_dim = spec.xdims[0]
    mask = jnp.arange(spec.xdim) < ego_dim
    new_x0 = jnp.where(mask, op.xs[shift], x)

    # --- left-shift the plan by `shift`, zero-pad the tail (:127-186) ---
    idx = jnp.arange(N) + shift
    valid = idx < N
    idx_c = jnp.minimum(idx, N - 1)

    us_shift = op.us[idx_c] * valid[:, None, None]
    Ps_shift = strategy.Ps[idx_c] * valid[:, None, None, None]
    alphas_shift = strategy.alphas[idx_c] * valid[:, None, None]
    xs_shift = op.xs[idx_c]

    # Propagate tail states with zero controls from the last valid state.
    def prop(carry, k):
        x_prev = carry
        x_plan = xs_shift[k]
        x_int = dyn_base.integrate(
            dyn,
            new_t0 + (k - 1).astype(jnp.float32) * dt,
            dt,
            x_prev,
            jnp.zeros((spec.num_players, spec.umax), jnp.float32),
        )
        x_k = jnp.where(valid[k], x_plan, x_int)
        return x_k, x_k

    _, xs_new = jax.lax.scan(prop, xs_shift[0], jnp.arange(N))

    new_op = OperatingPoint(xs=xs_new, us=us_shift, t0=new_t0)
    new_strategy = Strategy(Ps=Ps_shift, alphas=alphas_shift)
    return new_op, new_strategy, new_x0


# ---------------------------------------------------------------------------
# Solution splicer.
# ---------------------------------------------------------------------------
@struct.dataclass
class Splicer:
    """Execution plan: horizon plus <= 5 retained past steps.

    xs: [N + KEEP, xdim]; us/Ps/alphas likewise; t0 of entry 0.
    `length` counts valid entries."""

    op: OperatingPoint  # arrays sized N + KEEP
    strategy: Strategy
    length: jnp.ndarray  # int32

    @classmethod
    def create(cls, spec: GameSpec, op: OperatingPoint, strategy: Strategy):
        keep = NUM_PREVIOUS_STEPS_TO_SAVE
        N = spec.num_time_steps

        def pad(a):
            pad_width = [(0, keep)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, pad_width)

        return cls(
            op=OperatingPoint(xs=pad(op.xs), us=pad(op.us), t0=op.t0),
            strategy=Strategy(Ps=pad(strategy.Ps), alphas=pad(strategy.alphas)),
            length=jnp.asarray(N, jnp.int32),
        )

    def contains_time(self, t, spec: GameSpec):
        rel = t - self.op.t0
        return (rel >= 0.0) & (
            rel < spec.dt * (self.length.astype(jnp.float32) - 1.0)
        )


def splice(
    spec: GameSpec,
    splicer: Splicer,
    new_op: OperatingPoint,
    new_strategy: Strategy,
) -> Splicer:
    """Merge a newly converged solution into the execution plan
    (SolutionSplicer::Splice, src/solution_splicer.cpp:60-130): keep up to
    5 steps before the new solution's start, then the new solution."""
    N = spec.num_time_steps
    keep = NUM_PREVIOUS_STEPS_TO_SAVE
    M = N + keep

    cur = (1e-4 + (new_op.t0 - splicer.op.t0) / spec.dt).astype(jnp.int32)
    initial = jnp.maximum(cur - keep, 0)
    n_past = cur - initial  # in [0, keep]

    # Output slot j: past steps for j < n_past (old plan at initial + j),
    # then the new solution (new plan at j - n_past).
    j = jnp.arange(M)
    old_idx = jnp.minimum(initial + j, M - 1)
    new_idx = jnp.clip(j - n_past, 0, N - 1)
    is_past = j < n_past
    valid = j < n_past + N

    def sel(old_a, new_a):
        shaped = lambda m: m.reshape((M,) + (1,) * (old_a.ndim - 1))
        return jnp.where(
            shaped(is_past), old_a[old_idx], new_a[new_idx]
        ) * shaped(valid)

    return Splicer(
        op=OperatingPoint(
            xs=sel(splicer.op.xs, new_op.xs),
            us=sel(splicer.op.us, new_op.us),
            t0=splicer.op.t0 + initial.astype(jnp.float32) * spec.dt,
        ),
        strategy=Strategy(
            Ps=sel(splicer.strategy.Ps, new_strategy.Ps),
            alphas=sel(splicer.strategy.alphas, new_strategy.alphas),
        ),
        length=n_past + N,
    )


def _splicer_spec(spec: GameSpec) -> GameSpec:
    """Shape spec for splicer-sized (N + KEEP) plan playback."""
    return dataclasses.replace(
        spec, num_time_steps=spec.num_time_steps + NUM_PREVIOUS_STEPS_TO_SAVE
    )


# ---------------------------------------------------------------------------
# The simulator.
# ---------------------------------------------------------------------------
@struct.dataclass
class SimState:
    x: jnp.ndarray  # true joint state
    t: jnp.ndarray  # sim time
    splicer: Splicer
    al_state: pcost.ALState
    converged: jnp.ndarray  # last solve converged
    num_replans: jnp.ndarray


def simulate(
    problem: Problem,
    params: SolverParams,
    final_time: float = 10.0,
    replan_interval: float = 0.25,
    planner_time: float = 0.25,
    x0: Optional[jnp.ndarray] = None,
    jit: bool = True,
):
    """Fixed-cadence receding-horizon simulation
    (reference RecedingHorizonSimulator, src/receding_horizon_simulator.cpp).

    Returns (states [n_cycles+1, xdim], times [n_cycles+1], SimState).
    Each cycle: advance the true state `replan_interval` along the spliced
    plan, set up a warm-started problem `planner_time` ahead, solve with
    the iteration budget, splice if converged."""
    spec = problem.spec
    dyn = problem.dynamics
    x0 = problem.x0 if x0 is None else x0

    # Initial full solve (reference CHECKs success; we record it).
    first = problem.solve(params, x0=x0, jit=jit)
    splicer0 = Splicer.create(spec, first.op, first.strategy)

    sspec = _splicer_spec(spec)
    max_span_steps = int(replan_interval / spec.dt) + 2

    def cycle(state: SimState):
        # 1. Advance the true state along the execution plan.
        t_next = state.t + replan_interval
        x_next = integrate_span(
            dyn, sspec, state.splicer.op, state.splicer.strategy,
            state.t, t_next, state.x, max_span_steps,
        )

        # 2. Warm-start shift from the spliced plan (truncated to horizon).
        N = spec.num_time_steps
        warm_op = OperatingPoint(
            xs=state.splicer.op.xs[:N],
            us=state.splicer.op.us[:N],
            t0=state.splicer.op.t0,
        )
        warm_strategy = Strategy(
            Ps=state.splicer.strategy.Ps[:N],
            alphas=state.splicer.strategy.alphas[:N],
        )
        new_op, new_strategy, new_x0 = setup_next_receding_horizon(
            dyn, spec, warm_op, warm_strategy, x_next, t_next, planner_time
        )

        # 3. Solve, warm-started.
        res = al_solver.solve(
            dyn, problem.player_costs, spec, params,
            new_x0, new_op, new_strategy, state.al_state,
        )

        # 4. Splice in if converged (src/receding_horizon_simulator.cpp:135).
        spliced = splice(
            spec, state.splicer,
            res.op, res.strategy,
        )
        keep = lambda a, b: jnp.where(res.converged, a, b)
        new_splicer = jax.tree_util.tree_map(keep, spliced, state.splicer)

        return SimState(
            x=x_next,
            t=t_next,
            splicer=new_splicer,
            al_state=state.al_state,
            converged=res.converged,
            num_replans=state.num_replans + 1,
        )

    cycle_fn = jax.jit(cycle) if jit else cycle

    state = SimState(
        x=jnp.asarray(x0),
        t=jnp.asarray(0.0, jnp.float32),
        splicer=splicer0,
        al_state=problem.initial_al_state(),
        converged=first.converged,
        num_replans=jnp.asarray(0, jnp.int32),
    )

    n_cycles = int(final_time / replan_interval) - 1
    states = [state.x]
    times = [state.t]
    for _ in range(n_cycles):
        state = cycle_fn(state)
        states.append(state.x)
        times.append(state.t)
    return jnp.stack(states), jnp.stack(times), state


def simulate_minimally_invasive(
    original: Problem,
    safety: Problem,
    params: SolverParams,
    final_time: float = 10.0,
    replan_interval: float = 0.25,
    planner_time: float = 0.25,
    safety_threshold: float = -1.0,
    x0: Optional[jnp.ndarray] = None,
    jit: bool = True,
):
    """Dual-solver safety-filtered receding horizon
    (reference MinimallyInvasiveRecedingHorizonSimulator,
    src/minimally_invasive_receding_horizon_simulator.cpp:68-218): each
    cycle warm-starts and solves BOTH the original and the safety problem
    from the shared spliced plan; the safety controller is spliced in when
    P1's safety value exceeds `safety_threshold` (in meters for
    reachability-style safety problems) or when only the safety solve
    converged; otherwise the original controller is used.

    Returns (states, times, active_flags [n_cycles] bool — True when the
    safety controller was active, final SimState of the shared plan)."""
    assert original.spec.xdim == safety.spec.xdim
    spec = original.spec
    dyn = original.dynamics
    x0 = original.x0 if x0 is None else x0

    first = original.solve(params, x0=x0, jit=jit)
    splicer0 = Splicer.create(spec, first.op, first.strategy)

    sspec = _splicer_spec(spec)
    max_span_steps = int(replan_interval / spec.dt) + 2

    def cycle(state: SimState):
        t_next = state.t + replan_interval
        x_next = integrate_span(
            dyn, sspec, state.splicer.op, state.splicer.strategy,
            state.t, t_next, state.x, max_span_steps,
        )

        N = spec.num_time_steps
        warm_op = OperatingPoint(
            xs=state.splicer.op.xs[:N], us=state.splicer.op.us[:N],
            t0=state.splicer.op.t0,
        )
        warm_strategy = Strategy(
            Ps=state.splicer.strategy.Ps[:N],
            alphas=state.splicer.strategy.alphas[:N],
        )
        new_op, new_strategy, new_x0 = setup_next_receding_horizon(
            dyn, spec, warm_op, warm_strategy, x_next, t_next, planner_time
        )

        res_orig = al_solver.solve(
            original.dynamics, original.player_costs, spec, params,
            new_x0, new_op, new_strategy,
            pcost.ALState.init(original.player_costs, spec),
        )
        res_safe = al_solver.solve(
            safety.dynamics, safety.player_costs, spec, params,
            new_x0, new_op, new_strategy,
            pcost.ALState.init(safety.player_costs, spec),
        )

        # Switch criterion (…cpp:201-214).
        p1_safety_cost = res_safe.total_costs[0]
        use_safety = (p1_safety_cost > safety_threshold) | (
            res_safe.converged & ~res_orig.converged
        )

        spliced_orig = splice(spec, state.splicer, res_orig.op,
                              res_orig.strategy)
        spliced_safe = splice(spec, state.splicer, res_safe.op,
                              res_safe.strategy)
        pick = lambda a, b: jnp.where(use_safety, a, b)
        spliced = jax.tree_util.tree_map(pick, spliced_safe, spliced_orig)
        # Original only splices when converged; safety splices always
        # (…cpp:206-213).
        accept = use_safety | res_orig.converged
        keep = lambda a, b: jnp.where(accept, a, b)
        new_splicer = jax.tree_util.tree_map(keep, spliced, state.splicer)

        return SimState(
            x=x_next, t=t_next, splicer=new_splicer,
            al_state=state.al_state,
            converged=jnp.where(use_safety, res_safe.converged,
                                res_orig.converged),
            num_replans=state.num_replans + 1,
        ), use_safety

    cycle_fn = jax.jit(cycle) if jit else cycle

    state = SimState(
        x=jnp.asarray(x0), t=jnp.asarray(0.0, jnp.float32),
        splicer=splicer0, al_state=original.initial_al_state(),
        converged=first.converged, num_replans=jnp.asarray(0, jnp.int32),
    )
    n_cycles = int(final_time / replan_interval) - 1
    states, times, flags = [state.x], [state.t], []
    for _ in range(n_cycles):
        state, used_safety = cycle_fn(state)
        states.append(state.x)
        times.append(state.t)
        flags.append(used_safety)
    return (jnp.stack(states), jnp.stack(times),
            jnp.stack(flags) if flags else jnp.zeros((0,), bool), state)


def simulate_batched(
    problem: Problem,
    params: SolverParams,
    x0_batch: jnp.ndarray,
    final_time: float = 10.0,
    replan_interval: float = 0.25,
    planner_time: float = 0.25,
    backend: str = "xla",
    batch_block: int = 128,
    interpret: bool = False,
    mesh=None,
):
    """Batched receding-horizon simulation: B independent agents (varying
    initial states) replan in lockstep, each cycle one jitted vmapped step
    (BASELINE config 5: 1k-initial-state receding-horizon reachability).

    backend="pallas" routes every cycle's warm re-solve through the
    batch-level Pallas machine (solver/batched.py) with the integrate/
    splice phases vmapped around it; "auto" picks pallas off-CPU.

    Returns (states [n_cycles+1, B, xdim], times [n_cycles+1], SimState
    with batched leaves)."""
    if backend == "auto":
        backend = (
            "pallas"
            if (jax.default_backend() != "cpu" and not params.open_loop)
            else "xla"
        )
    if backend == "pallas":
        return _simulate_batched_pallas(
            problem, params, x0_batch, final_time, replan_interval,
            planner_time, batch_block, interpret, mesh,
        )
    spec = problem.spec
    dyn = problem.dynamics
    B = x0_batch.shape[0]

    solve_b = jax.jit(jax.vmap(
        lambda x: al_solver.solve(
            dyn, problem.player_costs, spec, params, x,
            problem.initial_operating_point(), problem.initial_strategy(),
            problem.initial_al_state(),
        )
    ))
    first = solve_b(x0_batch)
    splicer0 = jax.vmap(lambda op, st: Splicer.create(spec, op, st))(
        first.op, first.strategy
    )

    sspec = _splicer_spec(spec)
    max_span_steps = int(replan_interval / spec.dt) + 2

    def cycle(state: SimState):
        t_next = state.t + replan_interval
        x_next = integrate_span(
            dyn, sspec, state.splicer.op, state.splicer.strategy,
            state.t, t_next, state.x, max_span_steps,
        )
        N = spec.num_time_steps
        warm_op = OperatingPoint(
            xs=state.splicer.op.xs[:N], us=state.splicer.op.us[:N],
            t0=state.splicer.op.t0,
        )
        warm_strategy = Strategy(
            Ps=state.splicer.strategy.Ps[:N],
            alphas=state.splicer.strategy.alphas[:N],
        )
        new_op, new_strategy, new_x0 = setup_next_receding_horizon(
            dyn, spec, warm_op, warm_strategy, x_next, t_next, planner_time
        )
        res = al_solver.solve(
            dyn, problem.player_costs, spec, params,
            new_x0, new_op, new_strategy, state.al_state,
        )
        spliced = splice(spec, state.splicer, res.op, res.strategy)
        keep = lambda a, b: jnp.where(res.converged, a, b)
        new_splicer = jax.tree_util.tree_map(keep, spliced, state.splicer)
        return SimState(
            x=x_next, t=t_next, splicer=new_splicer,
            al_state=state.al_state, converged=res.converged,
            num_replans=state.num_replans + 1,
        )

    cycle_b = jax.jit(jax.vmap(cycle))

    tile = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), t
    )
    state = SimState(
        x=jnp.asarray(x0_batch),
        t=jnp.zeros((B,), jnp.float32),
        splicer=splicer0,
        al_state=tile(problem.initial_al_state()),
        converged=first.converged,
        num_replans=jnp.zeros((B,), jnp.int32),
    )
    n_cycles = int(final_time / replan_interval) - 1
    states, times = [state.x], [jnp.float32(0.0)]
    for c in range(n_cycles):
        state = cycle_b(state)
        states.append(state.x)
        times.append(jnp.float32((c + 1) * replan_interval))
    return jnp.stack(states), jnp.stack(times), state


def _simulate_batched_pallas(problem, params, x0_batch, final_time,
                             replan_interval, planner_time, batch_block,
                             interpret, mesh):
    """simulate_batched with the batch-level Pallas solver in the loop:
    each cycle = vmapped integrate/setup -> host-stepped batched warm
    solve (early exit when all lanes converge) -> vmapped splice."""
    from ilqgames_tpu.solver import batched as pb

    spec = problem.spec
    dyn = problem.dynamics
    B = x0_batch.shape[0]

    first_run = pb.make_host_batched_solver(
        dyn, problem.player_costs, spec, params,
        warm_op=problem.initial_operating_point(),
        warm_strategy=problem.initial_strategy(),
        batch_block=batch_block, interpret=interpret, mesh=mesh,
    )
    first = first_run(x0_batch)
    splicer0 = jax.jit(jax.vmap(
        lambda op, st: Splicer.create(spec, op, st)
    ))(first.op, first.strategy)

    warm_solver = pb.make_host_batched_warm_solver(
        dyn, problem.player_costs, spec, params,
        batch_block=batch_block, interpret=interpret, mesh=mesh,
    )

    sspec = _splicer_spec(spec)
    max_span_steps = int(replan_interval / spec.dt) + 2
    N = spec.num_time_steps

    def pre(state):
        t_next = state.t + replan_interval
        x_next = integrate_span(
            dyn, sspec, state.splicer.op, state.splicer.strategy,
            state.t, t_next, state.x, max_span_steps,
        )
        warm_op = OperatingPoint(
            xs=state.splicer.op.xs[:N], us=state.splicer.op.us[:N],
            t0=state.splicer.op.t0,
        )
        warm_strategy = Strategy(
            Ps=state.splicer.strategy.Ps[:N],
            alphas=state.splicer.strategy.alphas[:N],
        )
        new_op, new_strategy, new_x0 = setup_next_receding_horizon(
            dyn, spec, warm_op, warm_strategy, x_next, t_next, planner_time
        )
        return t_next, x_next, new_op, new_strategy, new_x0

    def post(state, t_next, x_next, res_op, res_strategy, res_converged):
        spliced = splice(spec, state.splicer, res_op, res_strategy)
        keep = lambda a, b: jnp.where(res_converged, a, b)
        new_splicer = jax.tree_util.tree_map(keep, spliced, state.splicer)
        return SimState(
            x=x_next, t=t_next, splicer=new_splicer,
            al_state=state.al_state, converged=res_converged,
            num_replans=state.num_replans + 1,
        )

    pre_b = jax.jit(jax.vmap(pre))
    post_b = jax.jit(jax.vmap(post))

    tile = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (B,) + a.shape), t
    )
    state = SimState(
        x=jnp.asarray(x0_batch),
        t=jnp.zeros((B,), jnp.float32),
        splicer=splicer0,
        al_state=tile(problem.initial_al_state()),
        converged=first.converged,
        num_replans=jnp.zeros((B,), jnp.int32),
    )
    n_cycles = int(final_time / replan_interval) - 1
    states, times = [state.x], [jnp.float32(0.0)]
    for c in range(n_cycles):
        t_next, x_next, new_op, new_strategy, new_x0 = pre_b(state)
        res = warm_solver(new_x0, new_op, new_strategy, state.al_state)
        state = post_b(state, t_next, x_next, res.op, res.strategy,
                       res.converged)
        states.append(state.x)
        times.append(jnp.float32((c + 1) * replan_interval))
    return jnp.stack(states), jnp.stack(times), state
