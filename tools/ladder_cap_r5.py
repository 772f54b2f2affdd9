"""Is the "deep-ladder cap for lanes that already rejected a full
ladder" decision-identical? (VERDICT r4 next-step 2b; round-3 idea.)

The proposed cap: a lane whose previous trip rejected ALL linesearch
candidates (failed) skips the deep candidate windows on subsequent
trips, on the claim that it "fails either way". Decision-identity
requires that a reject-all lane NEVER passes a later ladder. But the
machine changes the lane's state after every failure (reference
semantics: src/ilq_solver.cpp:146-155 early-fail, then
src/augmented_lagrangian_solver.cpp:166-178 — lambda/mu downscale and
an inner reinit), so the next trip's LQ strategies, merits and Armijo
thresholds all differ. This script measures, on the bench's own x0
distribution, how often a lane that rejected a full ladder at trip t
PASSES a ladder at a later trip (fail->pass transitions). Any nonzero
count refutes decision-identity of the cap.

Runs the vmapped fused machine (solver/fused.py — bitwise twin of the
production batched machine) on CPU; full flagship N=100, exec params,
B=64, sigma=0.1, RandomState(0) (bench.py's exact draw, first 64).
Output: tools/ladder_cap_r5.json.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.solver import fused, ilq
from ilqgames_tpu.solver.params import SolverParams
from ilqgames_tpu.types import OperatingPoint, Strategy

B = 64
TRIPS = 110

problem = make_problem()
dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec
params = SolverParams(
    max_solver_iters=100, unconstrained_solver_max_iters=10,
    max_backtracking_steps=100, initial_alpha_scaling=0.1,
    convergence_tolerance=1.0, expected_decrease_fraction=0.001,
)

rng = np.random.RandomState(0)
x0 = np.tile(np.asarray(problem.x0)[None], (B, 1))
x0 = jnp.asarray(x0 + 0.1 * rng.randn(*x0.shape).astype(np.float32))

wop = OperatingPoint.zeros(spec)
wst = Strategy.zeros(spec)
al0 = pcost.ALState.init(costs, spec)


def init_one(x0i):
    last_op = wop.replace(xs=wop.xs.at[0].set(x0i))
    op = dyn_base.rollout(dyn, spec, x0i, last_op, wst)
    _, ek = pcost.total_costs(costs, spec, op)
    quad = pcost.quadraticize(costs, spec, op, al0, ek)
    c0 = ilq._SolveCarry(
        op=op, strategy=wst, quad=quad, extreme_ks=ek,
        last_merit=jnp.asarray(jnp.inf, jnp.float32),
        iteration=jnp.asarray(0, jnp.int32),
        converged=jnp.asarray(False), failed=jnp.asarray(False),
    )
    return fused._FusedCarry(
        c=c0, al=al0, warm_op=c0.op, warm_strategy=c0.strategy,
        inner_iters=jnp.asarray(0, jnp.int32),
        cum_iters=jnp.asarray(0, jnp.int32),
        violation=jnp.asarray(jnp.inf, jnp.float32),
        success=jnp.asarray(True), done=jnp.asarray(False),
    )


fc = jax.jit(jax.vmap(init_one))(x0)
trip = jax.jit(jax.vmap(
    lambda x0i, f: fused._trip(dyn, costs, spec, params, x0i, f)))

failed_hist = []
done_hist = []
for t in range(TRIPS):
    fc2 = trip(x0, fc)
    # Freeze done lanes exactly as the production driver does.
    fc = jax.tree_util.tree_map(
        lambda a, b: jnp.where(
            fc.done.reshape((B,) + (1,) * (a.ndim - 1)), a, b), fc, fc2)
    failed_hist.append(np.asarray(fc.c.failed))
    done_hist.append(np.asarray(fc.done))
    if bool(np.all(done_hist[-1])):
        break

failed_hist = np.stack(failed_hist)   # [T, B]
done_hist = np.stack(done_hist)
T = failed_hist.shape[0]

# Active (not yet done at the START of trip t) lanes only.
active = np.ones_like(done_hist)
active[1:] = ~done_hist[:-1]

ever_failed = (failed_hist & active).any(axis=0)
# fail->pass transition: lane failed at some trip t, then at a later
# active trip t' did NOT fail (i.e., a ladder candidate passed Armijo).
fail_then_pass = np.zeros(B, bool)
first_pass_gap = []
for b in range(B):
    ts = np.nonzero(failed_hist[:, b] & active[:, b])[0]
    if not len(ts):
        continue
    t0 = ts[0]
    later_pass = np.nonzero(
        active[t0 + 1:, b] & ~failed_hist[t0 + 1:, b])[0]
    if len(later_pass):
        fail_then_pass[b] = True
        first_pass_gap.append(int(later_pass[0]) + 1)

out = dict(
    B=B, trips_run=int(T),
    lanes_ever_failed=int(ever_failed.sum()),
    lanes_fail_then_pass=int(fail_then_pass.sum()),
    fail_to_next_pass_gap_trips=sorted(first_pass_gap),
    total_fail_trips=int((failed_hist & active).sum()),
    total_pass_after_first_fail=int(sum(
        int((active[np.nonzero(failed_hist[:, b] & active[:, b])[0][0] + 1:, b]
             & ~failed_hist[np.nonzero(failed_hist[:, b] & active[:, b])[0][0] + 1:, b]).sum())
        for b in range(B) if (failed_hist[:, b] & active[:, b]).any())),
    verdict=(
        "REFUTED: lanes that rejected a full ladder later pass ladders "
        "(AL downscale changes the game between trips) — the cap is NOT "
        "decision-identical"
    ),
)
if out["lanes_fail_then_pass"] == 0:
    out["verdict"] = ("NO fail->pass transitions observed at B=64/110 "
                      "trips — cap empirically safe on this draw "
                      "(still not provably identical)")
with open("/root/repo/tools/ladder_cap_r5.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
