from ilqgames_tpu.dynamics.base import (
    MultiPlayerDynamics,
    SinglePlayerModel,
    concatenate,
    integrate,
    linearize,
    rollout,
)
from ilqgames_tpu.dynamics import models
