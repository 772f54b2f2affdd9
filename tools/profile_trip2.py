"""Serial per-stage breakdown of one batched Pallas trip at B=256 +
stage-2 firing stats across a real solve + batch_block scaling probe.

Run alone on the TPU (no other TPU process)."""
import json, time, functools
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
for _i in range(20):
    try:
        jax.devices(); break
    except RuntimeError:
        time.sleep(15)
import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.solver.params import SolverParams
from ilqgames_tpu.solver import batched, ilq
from ilqgames_tpu.solver.al import constraint_violations
from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_pallas
from ilqgames_tpu.ops.pallas.sweep import rollout_pallas, sweep_merits_pallas

OUT = "/root/repo/tools/profile_trip2.txt"
def rec(**kw):
    line = json.dumps(kw); print(line, flush=True)
    with open(OUT, "a") as f: f.write(line + "\n")

p = make_problem()
spec = p.spec
params = SolverParams(
    max_solver_iters=100, unconstrained_solver_max_iters=10,
    max_backtracking_steps=100, initial_alpha_scaling=0.1,
    convergence_tolerance=1.0, expected_decrease_fraction=0.001)
B = 256
rng = np.random.RandomState(0)
x0 = np.tile(np.asarray(p.x0)[None], (B, 1))
x0 += 0.1 * rng.randn(*x0.shape).astype(np.float32)
x0 = jnp.asarray(x0)

dyn, pcs = p.dynamics, p.player_costs

# ---- build mid-solve carries at a few trip depths, and stage2 stats ----
def init(x0_b):
    Bt = x0_b.shape[0]
    al0 = jax.vmap(lambda _: pcost.ALState.init(pcs, spec))(jnp.arange(Bt))
    wop = p.initial_operating_point()
    wst = p.initial_strategy()
    bc = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (Bt,) + a.shape), t)
    return batched._carry0(dyn, pcs, spec, x0_b, bc(wop), bc(wst), al0,
                           128, False)

trip_j = jax.jit(functools.partial(
    batched._trip_batched, dyn, pcs, spec, params,
    batch_block=128, interpret=False))
step_stats = jax.jit(lambda x0_b, fc: batched.iteration_step_batched(
    dyn, pcs, spec, params, x0_b, fc.al, fc.c, active=~fc.done,
    batch_block=128, interpret=False, return_stats=True))

fc = jax.jit(init)(x0)
jax.block_until_ready(fc.c.op.xs)
rec(stage="init_done")

s2_count = 0; n_trips = 60
snap = {}
t_trips = time.perf_counter()
for k in range(n_trips):
    if k in (5, 30):
        snap[k] = fc
    _, st = step_stats(x0, fc)
    s2_count += int(st["used_stage2"])
    fc = trip_j(x0, fc)
jax.block_until_ready(fc.c.op.xs)
rec(stage="stats", trips=n_trips, stage2_fired=s2_count,
    wall_per_trip_ms=round((time.perf_counter()-t_trips)/n_trips/2*1e3, 1),
    note="wall includes step_stats double-work; /2 approx")

fc5 = snap[5]; fc30 = snap[30]

def timeit(f, *args, reps=20):
    r = f(*args); jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter()-t0)/reps

def timeq(f, *args, reps=20):
    """Queued (pipelined) timing: dispatch all, block once."""
    r = f(*args); jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        r = f(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(r)[0])
    return (time.perf_counter()-t0)/reps

for label, fcs in (("t5", fc5), ("t30", fc30)):
    c = fcs.c; al = fcs.al
    rec(stage=f"{label}_trip_serial_ms",
        ms=round(timeit(trip_j, x0, fcs)*1e3, 1))

    # stage pieces
    lin_j = jax.jit(lambda c: jax.vmap(
        lambda o: dyn_base.linearize(dyn, spec, o))(c.op))
    lin = lin_j(c)
    rec(stage=f"{label}_lin_ms", ms=round(timeit(lin_j, c)*1e3, 1),
        q_ms=round(timeq(lin_j, c)*1e3, 1))

    lq_j = jax.jit(lambda lin, c, x0: solve_lq_feedback_pallas(
        spec, lin, c.quad, x0 - c.op.xs[:, 0],
        adaptive_regularization=params.adaptive_regularization,
        batch_block=128))
    lqsol = lq_j(lin, c, x0)
    rec(stage=f"{label}_lq_ms", ms=round(timeit(lq_j, lin, c, x0)*1e3, 1),
        q_ms=round(timeq(lq_j, lin, c, x0)*1e3, 1))

    gate = batched._extreme_gate_b(pcs, spec, c.extreme_ks)
    n_cand = params.max_backtracking_steps
    scalings = params.initial_alpha_scaling * (
        params.geometric_alpha_scaling ** jnp.arange(n_cand, dtype=jnp.float32))
    sw_j = jax.jit(lambda sc, c, lqs, al, gate: sweep_merits_pallas(
        dyn, pcs, spec, x0, c.op, lqs.strategy, sc, al, gate,
        batch_block=128))
    m1 = sw_j(scalings[:8], c, lqsol, al, gate)
    rec(stage=f"{label}_sweep8_ms",
        ms=round(timeit(sw_j, scalings[:8], c, lqsol, al, gate)*1e3, 1),
        q_ms=round(timeq(sw_j, scalings[:8], c, lqsol, al, gate)*1e3, 1))
    m2 = sw_j(scalings[8:40], c, lqsol, al, gate)
    rec(stage=f"{label}_sweep32_ms",
        ms=round(timeit(sw_j, scalings[8:40], c, lqsol, al, gate)*1e3, 1))

    ro_j = jax.jit(lambda c, lqs: rollout_pallas(
        dyn, spec, x0, c.op, lqs.strategy,
        scal=jnp.full((B,), 0.1, jnp.float32), batch_block=128))
    op2 = ro_j(c, lqsol)
    rec(stage=f"{label}_rollout_ms", ms=round(timeit(ro_j, c, lqsol)*1e3, 1),
        q_ms=round(timeq(ro_j, c, lqsol)*1e3, 1))

    quad_j = jax.jit(lambda op, al, c: batched._quad_b(pcs, spec, op, al,
                                                       c.extreme_ks))
    q = quad_j(op2, al, c)
    rec(stage=f"{label}_quad_ms", ms=round(timeit(quad_j, op2, al, c)*1e3, 1),
        q_ms=round(timeq(quad_j, op2, al, c)*1e3, 1))

    tot_j = jax.jit(lambda op: batched._totals_b(pcs, spec, op))
    rec(stage=f"{label}_totals_ms", ms=round(timeit(tot_j, op2)*1e3, 1))

    ed_j = jax.jit(lambda c, lqs: jax.vmap(
        lambda q, a, d: ilq._expected_decrease(spec, q, a, d)
    )(c.quad, lqs.strategy.alphas, lqs.delta_xs))
    rec(stage=f"{label}_expdec_ms", ms=round(timeit(ed_j, c, lqsol)*1e3, 1))

    bw_j = jax.jit(lambda m, a, b: batched._bwhere(m, a, b))
    mask = fcs.done
    rec(stage=f"{label}_bwhere_carry_ms",
        ms=round(timeit(bw_j, mask, fcs.c, fcs.c)*1e3, 1))

    viol_j = jax.jit(lambda op, al: jax.vmap(
        lambda o, a: constraint_violations(pcs, spec, o, a))(op, al))
    rec(stage=f"{label}_violations_ms",
        ms=round(timeit(viol_j, op2, al)*1e3, 1))

# ---- batch_block scaling probe on the two dominant kernels ----
c = fc30.c; al = fc30.al
lin = jax.jit(lambda c: jax.vmap(
    lambda o: dyn_base.linearize(dyn, spec, o))(c.op))(c)
gate = batched._extreme_gate_b(pcs, spec, c.extreme_ks)
scalings = params.initial_alpha_scaling * (
    params.geometric_alpha_scaling ** jnp.arange(8, dtype=jnp.float32))
for bb in (128, 256):
    lq_j = jax.jit(lambda lin, c, x0: solve_lq_feedback_pallas(
        spec, lin, c.quad, x0 - c.op.xs[:, 0],
        adaptive_regularization=True, batch_block=bb))
    lqsol = lq_j(lin, c, x0)
    ms = timeit(lq_j, lin, c, x0)*1e3
    sw_j = jax.jit(lambda sc, c, lqs, al, gate: sweep_merits_pallas(
        dyn, pcs, spec, x0, c.op, lqs.strategy, sc, al, gate,
        batch_block=bb))
    m = sw_j(scalings, c, lqsol, al, gate)
    ms2 = timeit(sw_j, scalings, c, lqsol, al, gate)*1e3
    rec(stage=f"blockscale_bb{bb}", lq_ms=round(ms,1), sweep8_ms=round(ms2,1))

rec(stage="done")
