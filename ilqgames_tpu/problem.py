"""Problem layer: a declarative game description + solve entry points.

TPU-native re-design of the reference Problem class
(include/ilqgames/solver/problem.h:61-176, src/problem.cpp). Instead of a
mutable object with Construct* template methods, a Problem here is a frozen
bundle of (dynamics, player costs, x0, spec) plus optional operating-point
initialization; solver state (operating point, strategies, AL multipliers)
lives in explicit pytrees owned by the caller. Receding-horizon warm-start
logic (`SetUpNextRecedingHorizon`, src/problem.cpp:64-186) lives in
`runtime/receding_horizon.py` as pure array ops.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics.base import MultiPlayerDynamics
from ilqgames_tpu.solver import al as al_solver
from ilqgames_tpu.solver import ilq
from ilqgames_tpu.solver.params import SolverParams
from ilqgames_tpu.types import GameSpec, OperatingPoint, Strategy


@dataclasses.dataclass(frozen=True, eq=False)
class Problem:
    """A complete N-player differential game definition.

    Everything static (shapes, costs-as-closures, dynamics) lives here;
    everything traced (x0, warm starts, multipliers) is passed to `solve`.
    """

    name: str
    dynamics: MultiPlayerDynamics
    player_costs: Tuple[pcost.PlayerCost, ...]
    x0: jnp.ndarray
    spec: GameSpec
    # Optional custom initial operating point (reference examples use
    # InitializeAlongRoute, src/initialize_along_route.cpp:54-73); defaults
    # to all zeros (solver/problem.h:139-148).
    op_initializer: Optional[Callable] = None

    @property
    def is_constrained(self) -> bool:
        return pcost.is_constrained(self.player_costs)

    def initial_operating_point(self, t0: float = 0.0) -> OperatingPoint:
        op = OperatingPoint.zeros(self.spec, t0)
        if self.op_initializer is not None:
            op = self.op_initializer(self.spec, op)
        return op

    def initial_strategy(self) -> Strategy:
        return Strategy.zeros(self.spec)

    def initial_al_state(self) -> pcost.ALState:
        return pcost.ALState.init(self.player_costs, self.spec)

    # ------------------------------------------------------------------
    # Solve entry points. These close over the static problem definition,
    # so jitting them re-uses one compiled executable per (problem, params).
    # ------------------------------------------------------------------
    def solve(
        self,
        params: SolverParams = SolverParams(),
        x0: Optional[jnp.ndarray] = None,
        warm_op: Optional[OperatingPoint] = None,
        warm_strategy: Optional[Strategy] = None,
        al_state: Optional[pcost.ALState] = None,
        jit: bool = True,
    ) -> al_solver.ALResult:
        """Full (AL-wrapped if constrained) solve from a warm start.

        Matches the exec mains' AugmentedLagrangianSolver flow
        (exec/three_player_intersection/main.cpp:100-146).
        """
        x0 = self.x0 if x0 is None else x0
        warm_op = self.initial_operating_point() if warm_op is None else warm_op
        warm_strategy = (
            self.initial_strategy() if warm_strategy is None else warm_strategy
        )
        al_state = self.initial_al_state() if al_state is None else al_state

        def run(x0_, op_, strat_, al_):
            return al_solver.solve(
                self.dynamics, self.player_costs, self.spec, params,
                x0_, op_, strat_, al_state=al_,
            )

        fn = jax.jit(run) if jit else run
        return fn(x0, warm_op, warm_strategy, al_state)

    def solve_logged(
        self,
        params: SolverParams = SolverParams(),
        x0: Optional[jnp.ndarray] = None,
        warm_op: Optional[OperatingPoint] = None,
        warm_strategy: Optional[Strategy] = None,
        max_iterations: Optional[int] = None,
    ):
        """iLQ solve with the full iterate history as a SolverLog
        (reference ILQSolver::Solve populating utils/solver_log.h)."""
        import numpy as np

        from ilqgames_tpu.costs import player_cost as pcost
        from ilqgames_tpu.utils.solver_log import SolverLog

        x0 = self.x0 if x0 is None else x0
        warm_op = self.initial_operating_point() if warm_op is None else warm_op
        warm_strategy = (
            self.initial_strategy() if warm_strategy is None else warm_strategy
        )

        res = jax.jit(
            lambda x, op, st: ilq.solve(
                self.dynamics, self.player_costs, self.spec, params,
                x, op, st, max_iterations=max_iterations,
                record_history=True,
            )
        )(x0, warm_op, warm_strategy)

        ops, strats, merits, conv, failed, active = res.history
        log = SolverLog(spec=self.spec)
        # Iterate 0 is the initial rollout (src/ilq_solver.cpp:107-112).
        first_op = jax.tree_util.tree_map(lambda a: a[0], ops)
        from ilqgames_tpu.dynamics.base import rollout

        init_rollout = jax.jit(
            lambda x, op, st: rollout(
                self.dynamics, self.spec, x,
                op.replace(xs=op.xs.at[0].set(x)), st,
            )
        )(x0, warm_op, warm_strategy)
        t0, _ = pcost.total_costs(self.player_costs, self.spec, init_rollout)
        log.add_iterate(init_rollout, warm_strategy, np.asarray(t0))
        for i in range(int(np.asarray(active).sum())):
            op_i = jax.tree_util.tree_map(lambda a: a[i], ops)
            st_i = jax.tree_util.tree_map(lambda a: a[i], strats)
            costs_i, _ = pcost.total_costs(
                self.player_costs, self.spec, op_i
            )
            log.add_iterate(
                op_i, st_i, np.asarray(costs_i),
                converged=bool(np.asarray(conv)[i]),
            )
        return res, log

    def solve_unconstrained(
        self,
        params: SolverParams = SolverParams(),
        x0: Optional[jnp.ndarray] = None,
        warm_op: Optional[OperatingPoint] = None,
        warm_strategy: Optional[Strategy] = None,
        max_iterations: Optional[int] = None,
        jit: bool = True,
    ) -> ilq.ILQResult:
        """Bare iLQ solve (constraints enter only via AL terms at their
        initial multipliers) — the reference's plain ILQSolver path."""
        x0 = self.x0 if x0 is None else x0
        warm_op = self.initial_operating_point() if warm_op is None else warm_op
        warm_strategy = (
            self.initial_strategy() if warm_strategy is None else warm_strategy
        )

        def run(x0_, op_, strat_):
            return ilq.solve(
                self.dynamics, self.player_costs, self.spec, params,
                x0_, op_, strat_, max_iterations=max_iterations,
            )

        fn = jax.jit(run) if jit else run
        return fn(x0, warm_op, warm_strategy)
