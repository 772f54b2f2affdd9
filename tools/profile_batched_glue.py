"""Profile the batched trip's XLA glue at B=256 on TPU: vmapped
linearize, quadraticize, totals+violations, plus the masked-update tree
glue — each in a 5-step serialized scan (no cross-step pipelining, like
the production host-stepped loop). JSON lines to tools/profile_glue.txt.
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

for _i in range(20):
    try:
        jax.devices()
        break
    except RuntimeError as e:
        print("init retry", _i, str(e)[:80], flush=True)
        time.sleep(15)

import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "profile_glue.txt")
NS = 5


def record(**kw):
    line = json.dumps(kw)
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
    from ilqgames_tpu.costs import player_cost as pcost
    from ilqgames_tpu.dynamics import base as dyn_base
    from ilqgames_tpu.examples.three_player_intersection import make_problem
    from ilqgames_tpu.solver import batched
    from ilqgames_tpu.solver.al import constraint_violations

    B = int(os.environ.get("PROF_BATCH", "256"))
    problem = make_problem()
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec

    rng = np.random.RandomState(0)
    x0b = jnp.asarray(
        np.tile(np.asarray(problem.x0)[None], (B, 1))
        + 0.1 * rng.randn(B, spec.xdim).astype(np.float32)
    )
    al0 = jax.vmap(lambda _: pcost.ALState.init(costs, spec))(jnp.arange(B))

    from ilqgames_tpu.types import OperatingPoint, Strategy

    wop = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape),
        OperatingPoint.zeros(spec))
    wst = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (B,) + a.shape),
        Strategy.zeros(spec))
    c0 = batched._init_inner_batched(
        dyn, costs, spec, x0b, wop, wst, al0,
        jnp.full((B,), jnp.inf, jnp.float32),
        batch_block=128, interpret=False)
    jax.block_until_ready(c0.op.xs)
    op0 = c0.op

    def serial(fn):
        """10-step scan where each step's input depends on the previous
        output (forces serialization inside one device program)."""
        def run(x0c):
            def body(x, _):
                out = fn(x)
                leaves = jax.tree_util.tree_leaves(out)
                bump = sum(jnp.sum(l.astype(jnp.float32)) * 1e-20
                           for l in leaves if l.dtype != bool)
                return x + bump, None

            x, _ = jax.lax.scan(body, x0c, None, length=NS)
            return x

        return jax.jit(run)

    # linearize
    lin10 = serial(lambda x: jax.vmap(
        lambda o: dyn_base.linearize(dyn, spec, o)
    )(op0.replace(xs=op0.xs + x[:, None, :] * 0)))
    record(stage="linearize", s_per_step=round(timeit(lin10, x0b) / NS, 4))

    # quadraticize
    quad10 = serial(lambda x: batched._quad_b(
        costs, spec, op0.replace(xs=op0.xs + x[:, None, :] * 0), al0,
        c0.extreme_ks))
    record(stage="quadraticize",
           s_per_step=round(timeit(quad10, x0b) / NS, 4))

    # totals + violations
    tcv10 = serial(lambda x: (
        batched._totals_b(costs, spec,
                          op0.replace(xs=op0.xs + x[:, None, :] * 0)),
        jax.vmap(lambda o, a: constraint_violations(costs, spec, o, a))(
            op0.replace(xs=op0.xs + x[:, None, :] * 0), al0),
    ))
    record(stage="totals_violations",
           s_per_step=round(timeit(tcv10, x0b) / NS, 4))

    # expected_decrease + gate + masked-update glue proxy: one real trip
    from ilqgames_tpu.solver.params import SolverParams
    params = SolverParams(
        max_solver_iters=100, unconstrained_solver_max_iters=10,
        max_backtracking_steps=100, initial_alpha_scaling=0.1,
        convergence_tolerance=1.0, expected_decrease_fraction=0.001,
    )
    from ilqgames_tpu.solver.fused import _FusedCarry

    fc0 = _FusedCarry(
        c=c0, al=al0, warm_op=c0.op, warm_strategy=c0.strategy,
        inner_iters=jnp.zeros((B,), jnp.int32),
        cum_iters=jnp.zeros((B,), jnp.int32),
        violation=jnp.full((B,), jnp.inf, jnp.float32),
        success=jnp.ones((B,), bool), done=jnp.zeros((B,), bool),
    )

    def trips(fc):
        def body(fc, _):
            fc2 = batched._trip_batched(
                dyn, costs, spec, params, x0b, fc,
                batch_block=128, interpret=False)
            return fc2, None

        fc, _ = jax.lax.scan(body, fc, None, length=NS)
        return fc

    trip5 = jax.jit(trips)
    record(stage="trip_batched", s_per_step=round(timeit(trip5, fc0) / NS, 4))

    # --- Ablations of iteration_step_batched's internals, each in the
    # same 5-step serialized scan, feeding back a scalar so XLA can't
    # dead-code or overlap the steps.
    from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_pallas
    from ilqgames_tpu.ops.pallas.sweep import rollout_pallas, \
        sweep_merits_pallas
    from ilqgames_tpu.solver import ilq

    c = c0
    gate = batched._extreme_gate_b(costs, spec, c.extreme_ks)
    scalings = params.initial_alpha_scaling * (
        params.geometric_alpha_scaling
        ** jnp.arange(8, dtype=jnp.float32))

    def seg_lq(x):
        cop = c.op.replace(xs=c.op.xs + x[:, None, :] * 0)
        lin = jax.vmap(lambda o: dyn_base.linearize(dyn, spec, o))(cop)
        lqsol = solve_lq_feedback_pallas(
            spec, lin, c.quad, x0b - cop.xs[:, 0],
            adaptive_regularization=params.adaptive_regularization,
            batch_block=128, interpret=False)
        ed = jax.vmap(
            lambda q, a, d: ilq._expected_decrease(spec, q, a, d)
        )(c.quad, lqsol.strategy.alphas, lqsol.delta_xs)
        return ed

    record(stage="lin_lq_ed",
           s_per_step=round(timeit(serial(seg_lq), x0b) / NS, 4))

    lin = jax.vmap(lambda o: dyn_base.linearize(dyn, spec, o))(c.op)
    lqsol = solve_lq_feedback_pallas(
        spec, lin, c.quad, x0b - c.op.xs[:, 0],
        adaptive_regularization=params.adaptive_regularization,
        batch_block=128, interpret=False)
    jax.block_until_ready(lqsol.strategy.Ps)

    def seg_sweep(x):
        cop = c.op.replace(xs=c.op.xs + x[:, None, :] * 0)
        return sweep_merits_pallas(
            dyn, costs, spec, x0b, cop, lqsol.strategy, scalings,
            al0, gate, batch_block=128, interpret=False)

    record(stage="sweep8",
           s_per_step=round(timeit(serial(seg_sweep), x0b) / NS, 4))

    def seg_roll_quad(x):
        cop = c.op.replace(xs=c.op.xs + x[:, None, :] * 0)
        scal = jnp.full((B,), 0.1, jnp.float32)
        op_sel = rollout_pallas(dyn, spec, x0b, cop, lqsol.strategy,
                                scal=scal, batch_block=128,
                                interpret=False)
        quad = batched._quad_b(costs, spec, op_sel, al0, c.extreme_ks)
        return quad

    record(stage="rollout_quad",
           s_per_step=round(timeit(serial(seg_roll_quad), x0b) / NS, 4))

    def seg_bwhere(x):
        mask = x[:, 0] > 0
        return batched._bwhere(mask, c, c)

    record(stage="bwhere_carry",
           s_per_step=round(timeit(serial(seg_bwhere), x0b) / NS, 4))
    record(stage="done")


if __name__ == "__main__":
    main()
