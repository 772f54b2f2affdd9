"""Skeleton example: the tutorial template for defining a new game
(reference src/skeleton_example.cpp / exec/skeleton_example, which ships a
minimal single-player unicycle with a goal cost as a starting point).

Copy this module to create a new problem:
  1. pick per-player dynamics from ilqgames_tpu.dynamics.models (or write
     a SinglePlayerModel with a pure `ode(t, x, u)`),
  2. concatenate them,
  3. build per-player costs from ilqgames_tpu.costs.atoms/constraints,
  4. return a Problem.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ilqgames_tpu.costs import atoms
from ilqgames_tpu.costs.player_cost import PlayerCost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.dynamics import models

from ilqgames_tpu.problem import Problem

GOAL = (10.0, 10.0)
GOAL_WEIGHT = 10.0
CONTROL_WEIGHT = 1.0


def make_problem(dt=None, num_time_steps=None) -> Problem:
    # 1-2. Dynamics: a single 4D unicycle.
    dyn = dyn_base.concatenate("skeleton", [models.unicycle_4d()])
    spec = dyn.spec(dt=dt, num_time_steps=num_time_steps)

    # 3. Costs: drive to the goal, penalize control effort.
    pc = PlayerCost(
        state_costs=(
            atoms.quadratic(GOAL_WEIGHT, 0, GOAL[0], "GoalX"),
            atoms.quadratic(GOAL_WEIGHT, 1, GOAL[1], "GoalY"),
        ),
        control_costs=(
            (0, atoms.quadratic(CONTROL_WEIGHT, None, 0.0, "Control")),
        ),
    )

    # 4. Initial state: at the origin, heading along +x at 1 m/s.
    x0 = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    return Problem(
        name="skeleton", dynamics=dyn, player_costs=(pc,),
        x0=jnp.asarray(x0), spec=spec,
    )
