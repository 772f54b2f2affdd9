"""TPU bring-up for the Pallas kernels: compile, parity-check vs the XLA
scan path on-device, and time queued dispatches. Writes JSON lines to
tools/tpu_check_results.txt as each stage completes (compiles over the
axon tunnel take minutes each; the persistent cache makes re-runs fast).
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
        print(f"init retry {_i}: {e}", flush=True)
        time.sleep(15)

import jax.numpy as jnp
import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "tpu_check_results.txt")


def record(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def timeit(fn, *args, reps=5):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return compile_s, (time.perf_counter() - t0) / reps, out


def maxdiff(a, b, sane=1e4):
    """Max RELATIVE |a-b|/(1+|b|) over entries where both are finite and
    |b| < sane. Cold-start instances legitimately explode in the f32 LQ
    recursion (identically in both paths — same NaN fraction both sides);
    on exploded lanes tiny relative op-order differences compound into
    meaningless absolute gaps, so parity is asserted on sane lanes."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    ok = jnp.isfinite(a) & jnp.isfinite(b) & (jnp.abs(b) < sane)
    return float(jnp.max(jnp.where(
        ok, jnp.abs(a - b) / (1.0 + jnp.abs(b)), 0.0)))


def nanfrac(a):
    return float(jnp.mean(jnp.isnan(jnp.asarray(a)).astype(jnp.float32)))


def main():
    from ilqgames_tpu.costs import player_cost as pcost
    from ilqgames_tpu.dynamics import base as dyn_base
    from ilqgames_tpu.examples.three_player_intersection import make_problem
    from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_pallas
    from ilqgames_tpu.ops.pallas.sweep import rollout_pallas, \
        sweep_merits_pallas
    from ilqgames_tpu.solver import batched, ilq
    from ilqgames_tpu.solver.lq_feedback import solve_lq_feedback
    from ilqgames_tpu.types import OperatingPoint, Strategy

    B = int(os.environ.get("CHECK_BATCH", "256"))
    Bb = int(os.environ.get("CHECK_BLOCK", "128"))
    problem = make_problem()
    dyn, costs, spec = problem.dynamics, problem.player_costs, problem.spec

    rng = np.random.RandomState(0)
    x0b = jnp.asarray(
        np.tile(np.asarray(problem.x0)[None], (B, 1))
        + 0.1 * rng.randn(B, spec.xdim).astype(np.float32)
    )
    al0 = jax.vmap(lambda _: pcost.ALState.init(costs, spec))(jnp.arange(B))
    warm_op = OperatingPoint.zeros(spec)
    warm_strategy = Strategy.zeros(spec)

    def init_one(x0):
        last_op = warm_op.replace(xs=warm_op.xs.at[0].set(x0))
        op = dyn_base.rollout(dyn, spec, x0, last_op, warm_strategy)
        _, ek = pcost.total_costs(costs, spec, op)
        al1 = pcost.ALState.init(costs, spec)
        quad = pcost.quadraticize(costs, spec, op, al1, ek)
        lin = dyn_base.linearize(dyn, spec, op)
        return op, ek, quad, lin

    t0 = time.perf_counter()
    op_b, ek_b, quad_b, lin_b = jax.jit(jax.vmap(init_one))(x0b)
    jax.block_until_ready(op_b.xs)
    record(stage="init", compile_s=round(time.perf_counter() - t0, 1))

    dx0 = x0b - op_b.xs[:, 0]

    # ---- LQ: pallas vs XLA ----
    lq_pallas = jax.jit(lambda l, q, d: solve_lq_feedback_pallas(
        spec, l, q, d, batch_block=Bb))
    cs, rs, sol_p = timeit(lq_pallas, lin_b, quad_b, dx0)
    record(stage="lq_pallas", compile_s=round(cs, 1), run_s=round(rs, 4))

    lq_xla = jax.jit(jax.vmap(
        lambda l, q, d: solve_lq_feedback(spec, l, q, d)))
    cs, rs, sol_x = timeit(lq_xla, lin_b, quad_b, dx0)
    record(stage="lq_xla", compile_s=round(cs, 1), run_s=round(rs, 4))
    record(stage="lq_parity",
           dPs=maxdiff(sol_p.strategy.Ps, sol_x.strategy.Ps),
           dal=maxdiff(sol_p.strategy.alphas, sol_x.strategy.alphas),
           ddx=maxdiff(sol_p.delta_xs, sol_x.delta_xs),
           nan_pallas=nanfrac(sol_p.strategy.Ps),
           nan_xla=nanfrac(sol_x.strategy.Ps),
           nan_quad=nanfrac(quad_b.Q), nan_lin=nanfrac(lin_b.A))

    # ---- rollout: pallas vs XLA ----
    strat = sol_x.strategy
    scal = jnp.full((B,), 0.1, jnp.float32)
    roll_pallas = jax.jit(lambda x0, op, st, s: rollout_pallas(
        dyn, spec, x0, op, st, scal=s, batch_block=Bb))
    cs, rs, op_p = timeit(roll_pallas, x0b, op_b, strat, scal)
    record(stage="rollout_pallas", compile_s=round(cs, 1), run_s=round(rs, 4))

    roll_xla = jax.jit(jax.vmap(
        lambda x0, op, st: dyn_base.rollout(
            dyn, spec, x0, op, st.scale_alphas(0.1))))
    cs, rs, op_x = timeit(roll_xla, x0b, op_b, strat)
    record(stage="rollout_xla", compile_s=round(cs, 1), run_s=round(rs, 4))
    record(stage="rollout_parity", dxs=maxdiff(op_p.xs, op_x.xs),
           dus=maxdiff(op_p.us, op_x.us))

    # ---- sweep: pallas vs XLA ----
    scals = 0.1 * (0.5 ** jnp.arange(8, dtype=jnp.float32))
    gate = batched._extreme_gate_b(costs, spec, ek_b)
    sweep_p = jax.jit(lambda x0, op, st, al, g: sweep_merits_pallas(
        dyn, costs, spec, x0, op, st, scals, al, g, batch_block=Bb))
    cs, rs, mer_p = timeit(sweep_p, x0b, op_b, strat, al0, gate)
    record(stage="sweep_pallas", compile_s=round(cs, 1), run_s=round(rs, 4))

    gate_full = jnp.ones((spec.num_time_steps, spec.num_players),
                         jnp.float32)
    sweep_x = jax.jit(jax.vmap(
        lambda x0, op, st, al: ilq.sweep_merits_scan(
            dyn, costs, spec, x0, op, st, scals, al, gate_full)))
    cs, rs, mer_x = timeit(sweep_x, x0b, op_b, strat, al0)
    record(stage="sweep_xla", compile_s=round(cs, 1), run_s=round(rs, 4))
    record(stage="sweep_parity", dmerit=maxdiff(mer_p, mer_x),
           rel=float(jnp.max(jnp.abs(mer_p - mer_x)
                             / (1e-6 + jnp.abs(mer_x)))))

    record(stage="done")


if __name__ == "__main__":
    main()
