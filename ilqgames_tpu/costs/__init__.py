from ilqgames_tpu.costs.base import Constraint, Cost
from ilqgames_tpu.costs.player_cost import ALState, PlayerCost
from ilqgames_tpu.costs import atoms, constraints
