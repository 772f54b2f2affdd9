from ilqgames_tpu.solver.params import SolverParams
from ilqgames_tpu.solver.lq_feedback import solve_lq_feedback
from ilqgames_tpu.solver.lq_open_loop import solve_lq_open_loop
from ilqgames_tpu.solver import al, ilq
