"""Per-cost evaluation cache for inspection/plotting
(reference PlayerCostCache, utils/player_cost_cache.h:60-100): evaluates
every *named* cost of every player at every timestep of every iterate of
a log, so a cost inspector can plot any single cost vs time."""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.problem import Problem
from ilqgames_tpu.types import OperatingPoint
from ilqgames_tpu.utils.solver_log import SolverLog


def evaluate_costs(problem: Problem, op: OperatingPoint):
    """{player -> {cost name -> [N] stage values}} at one operating point."""
    spec = problem.spec
    ts = spec.horizon_times()
    out: List[Dict[str, np.ndarray]] = []
    for i, pc in enumerate(problem.player_costs):
        per: Dict[str, np.ndarray] = {}
        for c in pc.state_costs:
            per[c.name] = np.asarray(jax.vmap(c.evaluate)(ts, op.xs))
        for j, c in pc.control_costs:
            per[c.name] = np.asarray(jax.vmap(c.evaluate)(ts, op.us[:, j]))
        out.append(per)
    return out


class PlayerCostCache:
    """Evaluates and stores every cost at every iterate of a SolverLog."""

    def __init__(self, problem: Problem, log: SolverLog):
        self.problem = problem
        self.log = log
        self._cache = [
            evaluate_costs(problem, op) for op in log.operating_points
        ]

    def evaluate(self, iterate: int, player: int, name: str) -> np.ndarray:
        return self._cache[iterate][player][name]

    def names(self, player: int) -> Tuple[str, ...]:
        return tuple(self._cache[0][player].keys()) if self._cache else ()
