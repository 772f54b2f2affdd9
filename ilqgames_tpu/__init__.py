"""ilqgames_tpu: a TPU-native solver for N-player general-sum differential
games (iterative LQ game approximation), built on JAX/XLA/Pallas.

Capability parity with HJReachability/ilqgames (see SURVEY.md), re-designed
for TPU: pure-functional pytrees, lax.scan Riccati kernels, vmap/pjit
batching over thousands of game instances.
"""

import jax as _jax

# The solver's fixed point is sensitive to matmul precision: the reference
# is float32 Eigen (include/ilqgames/utils/types.h:68-69), and on TPU the
# default dot precision truncates operands to bfloat16, which visibly
# perturbs the coupled-Riccati recursion. All matrices here are tiny (the
# MXU win comes from batching, not from wide bf16 matmuls), so force full
# float32 dots.
_jax.config.update("jax_default_matmul_precision", "float32")

from ilqgames_tpu.types import (
    GameSpec,
    LinearDynamics,
    LQSolution,
    OperatingPoint,
    QuadraticCosts,
    Strategy,
)
from ilqgames_tpu.solver.params import SolverParams

__version__ = "0.1.0"
