"""Solver parameters (reference solver/solver_params.h:50-84).

A static (hashable) dataclass closed over at trace time. Wall-clock
"anytime" budgets from the reference become iteration budgets here; the
host-side runtime (runtime/) layers real-time cutoffs on top.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class SolverParams:
    # Convergence: merit decreased and |delta merit| below tolerance
    # (solver/ilq_solver.h:126-130).
    convergence_tolerance: float = 1e-1
    max_solver_iters: int = 1000

    # Armijo linesearch (src/ilq_solver.cpp:289-362).
    linesearch: bool = True
    initial_alpha_scaling: float = 0.5
    geometric_alpha_scaling: float = 0.5
    max_backtracking_steps: int = 10
    expected_decrease_fraction: float = 0.1

    # Open-loop vs feedback Nash.
    open_loop: bool = False

    # State and control regularization (added in PlayerCost construction).
    state_regularization: float = 0.0
    control_regularization: float = 0.0

    # Augmented Lagrangian (src/augmented_lagrangian_solver.cpp:72-210).
    unconstrained_solver_max_iters: int = 10
    geometric_mu_scaling: float = 1.1
    geometric_mu_downscaling: float = 0.5
    geometric_lambda_downscaling: float = 0.5
    constraint_error_tolerance: float = 1e-1
    max_al_iters: int = 100  # outer-loop cap (mains use 100)

    # Reset behavior after an AL solve.
    reset_problem: bool = True
    reset_lambdas: bool = True
    reset_mu: bool = True

    # LQ kernel regularization (Gershgorin; src/lq_feedback_solver.cpp:163).
    adaptive_regularization: bool = True

    # Parallel-linesearch tranche width (TPU-native knob; no reference
    # analogue). Candidate stepsizes are merit-evaluated `chunk` at a time;
    # iterations that accept in the first tranche — the typical case — do
    # `chunk` rollouts of work instead of max_backtracking_steps. In the
    # batched machine this is the PHASE-1 (full-batch) chunk width; the
    # measured idx distribution (~94% of accepting lanes take candidate
    # 0, tools/profile_trip3.txt) plus the compact deep ladder make a
    # narrow phase 1 optimal (measured trip: width 1 = 82.5 ms,
    # 2 = 85.6, 4 = 92.6 at B=256). Sweep-kernel cost is ~linear in
    # width with a small fixed term (tools/sweep_width.txt).
    linesearch_chunk: int = 1

    # Deep-window width of the batched machine's PHASE-2 compact ladder
    # (lanes still unhappy after phase 1 are gathered into one lane
    # block and swept `linesearch_deep_chunk` candidates per round).
    # Chunking never changes decisions (merits are chunk-invariant and
    # selection is first-pass).
    linesearch_deep_chunk: int = 8

    # f32 ladder cap (TPU-native knob; no reference analogue). The
    # backtracking ladder alpha_k = alpha0 * s^k collapses numerically:
    # by k ~ 25 (alpha ~ 3e-9) a candidate's controls u_ref - P dx -
    # alpha*a are float32-identical to the alpha->0 limit, so every
    # deeper candidate produces a bitwise-equal rollout and merit
    # (verified per-trip on the flagship: merits constant from k<=25).
    # The batched path therefore merit-evaluates only the first
    # `linesearch_eval_cap` candidates and reuses the last evaluated
    # merit for the rest — Armijo is still applied per-candidate with
    # each k's own threshold, so selection is exactly what evaluating
    # the full ladder would return. 0 disables the cap. 40 leaves a
    # >= 2^14 margin below the observed collapse point.
    linesearch_eval_cap: int = 40
