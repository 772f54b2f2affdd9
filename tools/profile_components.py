"""Profile the fused-trip components at batch 256 on TPU.

Each component runs inside a 10-step lax.scan whose carry feeds the next
step (serialized, like the production while_loop — no cross-step
pipelining), so per-step numbers reflect true in-loop latency.

Writes one JSON line per component to tools/profile_results.txt.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# The axon tunnel can refuse registration while a previous holder's lock
# drains; retry before giving up.
for _attempt in range(10):
    try:
        jax.devices()
        break
    except RuntimeError as e:  # noqa: PERF203
        print(f"backend init failed ({e}); retrying in 20 s", flush=True)
        time.sleep(20)

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "profile_results.txt")


def record(name, seconds_per_step, note=""):
    line = json.dumps(
        {"component": name, "s_per_step": round(seconds_per_step, 5), "note": note}
    )
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from ilqgames_tpu.examples.three_player_intersection import make_problem
    from ilqgames_tpu.solver.params import SolverParams
    from ilqgames_tpu.solver import fused, ilq
    from ilqgames_tpu.solver.lq_feedback import solve_lq_feedback
    from ilqgames_tpu.costs import player_cost as pcost
    from ilqgames_tpu.dynamics import base as dyn_base

    B = int(os.environ.get("PROF_BATCH", "256"))
    NSCAN = 10

    problem = make_problem()
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec
    params = SolverParams(
        max_solver_iters=100,
        unconstrained_solver_max_iters=10,
        max_backtracking_steps=100,
        initial_alpha_scaling=0.1,
        convergence_tolerance=1.0,
        expected_decrease_fraction=0.001,
    )
    import dataclasses as _dc
    params_nols = _dc.replace(params, linesearch=False)

    rng = np.random.RandomState(0)
    x0b = np.tile(np.asarray(problem.x0)[None], (B, 1))
    x0b = jnp.asarray(x0b + 0.1 * rng.randn(*x0b.shape).astype(np.float32))

    al0 = pcost.ALState.init(costs, spec)

    # ---- Pallas smoke test first: does Mosaic compile over axon? ----
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def add_kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] * 2.0 + 1.0

        @jax.jit
        def pallas_double(x):
            return pl.pallas_call(
                add_kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x)

        xt = jnp.ones((128, 256), jnp.float32)
        res = pallas_double(xt)
        ok = bool(jnp.allclose(res, 3.0))
        record("pallas_smoke", 0.0, f"works={ok} backend={jax.default_backend()}")
    except Exception as e:  # noqa: BLE001
        record("pallas_smoke", -1.0, f"FAILED: {type(e).__name__}: {e}"[:300])

    # ---- init a realistic batched carry (one fused init) ----
    from ilqgames_tpu.types import OperatingPoint, Strategy

    warm_op = OperatingPoint.zeros(spec)
    warm_strategy = Strategy.zeros(spec)

    def init_one(x0):
        last_op = warm_op.replace(xs=warm_op.xs.at[0].set(x0))
        current_op = dyn_base.rollout(dyn, spec, x0, last_op, warm_strategy)
        _, extreme_ks = pcost.total_costs(costs, spec, current_op)
        quad = pcost.quadraticize(costs, spec, current_op, al0, extreme_ks)
        c0 = ilq._SolveCarry(
            op=current_op, strategy=warm_strategy, quad=quad,
            extreme_ks=extreme_ks,
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

    fc0 = jax.jit(jax.vmap(init_one))(x0b)
    jax.block_until_ready(fc0.c.op.xs)
    record("init", 0.0, "batched init done")

    # ---- full trip x NSCAN ----
    def trips(fc, p):
        def body(fc, _):
            fc2 = jax.vmap(
                lambda x0, f: fused._trip(dyn, costs, spec, p, x0, f)
            )(x0b, fc)
            return fc2, None

        fc, _ = jax.lax.scan(body, fc, None, length=NSCAN)
        return fc

    trip_full = jax.jit(lambda fc: trips(fc, params))
    t = timeit(trip_full, fc0)
    record("trip_full", t / NSCAN, f"B={B}")

    trip_nols = jax.jit(lambda fc: trips(fc, params_nols))
    t = timeit(trip_nols, fc0)
    record("trip_no_linesearch", t / NSCAN, f"B={B}")

    # ---- components, serialized scans ----
    c0 = fc0.c
    op0, quad0 = c0.op, c0.quad

    # rollout
    def roll10(xs0):
        def body(x0c, _):
            op = jax.vmap(
                lambda x, o, s: dyn_base.rollout(dyn, spec, x, o, s)
            )(x0c, op0, c0.strategy)
            return x0c + 1e-9 * op.xs[:, -1], op.xs[:, -1]

        out, _ = jax.lax.scan(body, xs0, None, length=NSCAN)
        return out

    t = timeit(jax.jit(roll10), x0b)
    record("rollout", t / NSCAN, f"B={B}")

    # linearize
    def lin10(xs0):
        def body(x0c, _):
            lin = jax.vmap(lambda o: dyn_base.linearize(dyn, spec, o))(
                op0.replace(xs=op0.xs + 1e-9 * x0c[:, None, :])
            )
            return x0c + 1e-9 * lin.A[:, 0, 0], None

        out, _ = jax.lax.scan(body, xs0, None, length=NSCAN)
        return out

    t = timeit(jax.jit(lin10), x0b)
    record("linearize", t / NSCAN, f"B={B}")

    # LQ feedback solve
    lin0 = jax.jit(jax.vmap(lambda o: dyn_base.linearize(dyn, spec, o)))(op0)
    jax.block_until_ready(lin0.A)

    def lq10(dx0):
        def body(dxc, _):
            sol = jax.vmap(
                lambda l, q, d: solve_lq_feedback(spec, l, q, d)
            )(lin0, quad0, dxc)
            return dxc + 1e-9 * sol.delta_xs[:, -1], None

        out, _ = jax.lax.scan(body, dx0, None, length=NSCAN)
        return out

    t = timeit(jax.jit(lq10), x0b - op0.xs[:, 0])
    record("lq_feedback", t / NSCAN, f"B={B}")

    # quadraticize
    def quad10(xs0):
        def body(x0c, _):
            q = jax.vmap(
                lambda o, ek: pcost.quadraticize(costs, spec, o, al0, ek)
            )(op0.replace(xs=op0.xs + 1e-9 * x0c[:, None, :]), c0.extreme_ks)
            return x0c + 1e-9 * q.l[:, 0, 0], None

        out, _ = jax.lax.scan(body, xs0, None, length=NSCAN)
        return out

    t = timeit(jax.jit(quad10), x0b)
    record("quadraticize", t / NSCAN, f"B={B}")

    # total_costs + constraint_violations (boundary bookkeeping)
    from ilqgames_tpu.solver.al import constraint_violations

    def tc10(xs0):
        def body(x0c, _):
            opp = op0.replace(xs=op0.xs + 1e-9 * x0c[:, None, :])
            tot, ek = jax.vmap(
                lambda o: pcost.total_costs(costs, spec, o)
            )(opp)
            alinc, viol = jax.vmap(
                lambda o: constraint_violations(costs, spec, o, al0)
            )(opp)
            return x0c + 1e-9 * (tot[:, :1] + viol[:, None]), None

        out, _ = jax.lax.scan(body, xs0, None, length=NSCAN)
        return out

    t = timeit(jax.jit(tc10), x0b)
    record("totalcost_and_violations", t / NSCAN, f"B={B}")

    record("done", 0.0, "")


if __name__ == "__main__":
    sys.exit(main())
