"""Core containers for the TPU-native iLQGames framework.

Design notes
------------
Everything is a JAX pytree with *static* shape metadata held in `GameSpec`
(a hashable dataclass closed over at trace time). Per-player quantities are
stacked along a leading player axis, padded to the max control dimension so
that all arrays are dense and rectangular (TPU-friendly); `GameSpec.u_mask`
records which padded entries are real.

Reference parity (capability, not design):
  - OperatingPoint       ~ include/ilqgames/utils/operating_point.h:55-85
  - Strategy             ~ include/ilqgames/utils/strategy.h:59-85
    (affine feedback law u = u_ref - P dx - alpha)
  - LinearDynamicsApproximation ~ utils/linear_dynamics_approximation.h:53-72
  - QuadraticCostApproximation  ~ utils/quadratic_cost_approximation.h:61-86
  - types.h constants    ~ include/ilqgames/utils/types.h:64-143
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

# ---------------------------------------------------------------------------
# Global constants (reference: include/ilqgames/utils/types.h:119-143).
# ---------------------------------------------------------------------------
SMALL_NUMBER = 1e-4
DEFAULT_LAMBDA = 0.0
DEFAULT_MU = 10.0
DEFAULT_TIME_STEP = 0.1
DEFAULT_TIME_HORIZON = 10.0
DEFAULT_NUM_TIME_STEPS = int(
    (DEFAULT_TIME_HORIZON + 0.5 * DEFAULT_TIME_STEP) / DEFAULT_TIME_STEP
)  # = 100


def scan_unroll() -> int:
    """Unroll factor for the horizon scans. On TPU the per-step loop
    overhead dominates these tiny-tensor scans (measured ~18% end-to-end
    win at unroll=10); on CPU unrolling only multiplies test compile
    times. Resolved at trace time from the active backend."""
    return 10 if jax.default_backend() == "tpu" else 1


@dataclasses.dataclass(frozen=True)
class GameSpec:
    """Static description of an N-player dynamic game's shapes.

    All solver code closes over a GameSpec at trace time; it never appears
    inside traced arrays. Hashable so jitted functions can take it as a
    static argument.
    """

    xdims: Tuple[int, ...]  # per-player state dims (sub-blocks of joint x)
    udims: Tuple[int, ...]  # per-player control dims (<= umax, padded)
    dt: float = DEFAULT_TIME_STEP
    num_time_steps: int = DEFAULT_NUM_TIME_STEPS
    # Systems that are feedback-linearizable / already linear compute one
    # constant linearization up front (reference: src/ilq_solver.cpp:83-85).
    treat_as_linear: bool = False

    @property
    def num_players(self) -> int:
        return len(self.udims)

    @property
    def xdim(self) -> int:
        return sum(self.xdims)

    @property
    def umax(self) -> int:
        return max(self.udims)

    @property
    def total_udim(self) -> int:
        return sum(self.udims)

    @property
    def x_offsets(self) -> Tuple[int, ...]:
        out, acc = [], 0
        for d in self.xdims:
            out.append(acc)
            acc += d
        return tuple(out)

    def u_mask(self, dtype=jnp.float32) -> jnp.ndarray:
        """[P, umax] mask: 1 where the padded control entry is real."""
        m = jnp.zeros((self.num_players, self.umax), dtype=dtype)
        for i, d in enumerate(self.udims):
            m = m.at[i, :d].set(1.0)
        return m

    def horizon_times(self) -> jnp.ndarray:
        """Relative times of each knot: k * dt (reference RelativeTime)."""
        return jnp.arange(self.num_time_steps, dtype=jnp.float32) * self.dt


# ---------------------------------------------------------------------------
# Pytree containers.
# ---------------------------------------------------------------------------
@struct.dataclass
class OperatingPoint:
    """Time-indexed joint states and padded per-player controls.

    xs: [N, xdim]       joint state at each knot
    us: [N, P, umax]    per-player controls (padded with zeros)
    t0: scalar          absolute start time of the plan
    """

    xs: jnp.ndarray
    us: jnp.ndarray
    t0: jnp.ndarray

    @classmethod
    def zeros(cls, spec: GameSpec, t0: float = 0.0) -> "OperatingPoint":
        return cls(
            xs=jnp.zeros((spec.num_time_steps, spec.xdim), jnp.float32),
            us=jnp.zeros(
                (spec.num_time_steps, spec.num_players, spec.umax), jnp.float32
            ),
            t0=jnp.asarray(t0, jnp.float32),
        )


@struct.dataclass
class Strategy:
    """Affine time-varying feedback strategies for all players.

    The control law (reference utils/strategy.h:76-79) is
        u_i(k, dx) = u_ref_i(k) - Ps[k, i] @ dx - alphas[k, i].

    Ps:     [N, P, umax, xdim]
    alphas: [N, P, umax]
    """

    Ps: jnp.ndarray
    alphas: jnp.ndarray

    @classmethod
    def zeros(cls, spec: GameSpec) -> "Strategy":
        return cls(
            Ps=jnp.zeros(
                (spec.num_time_steps, spec.num_players, spec.umax, spec.xdim),
                jnp.float32,
            ),
            alphas=jnp.zeros(
                (spec.num_time_steps, spec.num_players, spec.umax), jnp.float32
            ),
        )

    def __call__(self, k, delta_x, u_ref):
        """Evaluate all players' controls at integer timestep k."""
        return (
            u_ref
            - jnp.einsum("pux,x->pu", self.Ps[k], delta_x)
            - self.alphas[k]
        )

    def scale_alphas(self, scaling) -> "Strategy":
        return self.replace(alphas=self.alphas * scaling)


@struct.dataclass
class LinearDynamics:
    """Time-indexed discrete-time linearization about an operating point.

    Convention matches the reference (dynamics/single_player_dynamical_system.h:59-66):
    A = I + dt * df/dx, B_i = dt * df/du_i (forward-Euler discretization of the
    Jacobian even though rollouts use RK4).

    A:  [N, xdim, xdim]
    Bs: [N, P, xdim, umax]
    """

    A: jnp.ndarray
    Bs: jnp.ndarray


@struct.dataclass
class QuadraticCosts:
    """Time- and player-indexed quadratic cost approximations (dense/padded).

    Q:  [N, P, xdim, xdim]   state Hessian for player i
    l:  [N, P, xdim]         state gradient
    R:  [N, P, P, umax, umax] control Hessian of player i w.r.t. player j's u
    r:  [N, P, P, umax]      control gradient

    Entries (i, j) where player i has no cost on player j's control are all
    zero — equivalent to the reference's sparse player->approximation map
    (utils/quadratic_cost_approximation.h:61-86).
    """

    Q: jnp.ndarray
    l: jnp.ndarray
    R: jnp.ndarray
    r: jnp.ndarray


@struct.dataclass
class LQSolution:
    """Output of an LQ game kernel.

    strategy: affine feedback laws (P == 0 for the open-loop kernel)
    delta_xs:  [N, xdim] optimal state perturbations
    costates:  [N, P, xdim]
    """

    strategy: Strategy
    delta_xs: jnp.ndarray
    costates: jnp.ndarray
