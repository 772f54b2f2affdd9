"""Per-instance parity against the UNMODIFIED reference on the benchmark's
own perturbed-x0 distribution.

bench.py perturbs the flagship's initial state (x0 + 0.1 * N(0,1), numpy
RandomState(0)); baselines/main_intersection_perturbed.cpp ran the
reference binary on the first 256 of those exact instances
(baselines/ref_perturbed_first256.jsonl). On non-chaotic instances the
two solvers land on the same local solution — these tests pin two fast
ones (both terminate in <=22 iterations, so the CPU solve is cheap):

  i=24: ref costs [10259.0, 10051.5, 268.2], viol 3.460 (22 iters, success=1)
  i=26: ref costs [10263.1,  3391.4,  34.4], viol 1.015 (22 iters, success=1)

(Early-linesearch-death instances — e.g. i=31, 7 iterates — are NOT
pinned: they sit on Armijo knife edges where CPU-vs-C++ ulps select
different basins; the reference itself lands elsewhere when recompiled.)

(Our AL bookkeeping discovers constraint satisfaction one inner solve
late — reference src/augmented_lagrangian_solver.cpp:108-140 — so iterate
counts differ by ~2; the landing point is the oracle.)

The diverged tail (cost > 1e6 on ~5-8% of instances) is SHIPPED
reference behavior on this distribution — both solvers blow up on
overlapping instances (baselines/measured.json "perturbed_x0_batch");
those chaotic instances are deliberately not pinned numerically.
"""

import json
import os

import numpy as np
import pytest

from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.solver.params import SolverParams

pytestmark = pytest.mark.slow  # full-solve / interpret-mode parity tier (~26 min total); fast gate: pytest -m "not slow"

HERE = os.path.dirname(__file__)
BASELINES = os.path.join(HERE, os.pardir, "baselines")

EXEC_PARAMS = SolverParams(
    max_solver_iters=100,
    unconstrained_solver_max_iters=10,
    max_backtracking_steps=100,
    initial_alpha_scaling=0.1,
    convergence_tolerance=1.0,
    expected_decrease_fraction=0.001,
)


def _load(idx):
    x0 = np.loadtxt(os.path.join(BASELINES, "x0_first32.txt"))[idx]
    with open(os.path.join(BASELINES, "ref_perturbed_first32.jsonl")) as f:
        ref = [json.loads(line) for line in f][idx]
    assert ref["i"] == idx
    return x0.astype(np.float32), ref


@pytest.mark.parametrize("idx", [24, 26])
def test_perturbed_instance_matches_reference(idx):
    x0, ref = _load(idx)
    prob = make_problem()
    res = prob.solve(EXEC_PARAMS, x0=x0)
    costs = np.asarray(res.total_costs)
    ref_costs = np.asarray(ref["costs"])
    # Same local solution: per-player totals within 2% (measured: <0.1%)
    # and final max constraint violation within 0.05.
    np.testing.assert_allclose(costs, ref_costs, rtol=2e-2)
    assert abs(float(res.max_violation) - ref["max_violation"]) < 0.05
