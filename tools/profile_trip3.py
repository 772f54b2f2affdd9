"""True per-trip cost via scan-length differencing + stage ablations.

Methodology: jit a lax.scan of K trips over a realistic mid-solve carry;
time K=25 vs K=5 blocking once per call; (t25-t5)/20 = per-trip device
time, immune to dispatch RTT and host artifacts. Ablations re-run the
same measurement with a stage semantically disabled.

Run alone on the TPU."""
import json, time, functools, dataclasses
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
from ilqgames_tpu.solver import batched
from ilqgames_tpu.costs import player_cost as pcost

OUT = "/root/repo/tools/profile_trip3.txt"
def rec(**kw):
    line = json.dumps(kw); print(line, flush=True)
    with open(OUT, "a") as f: f.write(line + "\n")

p = make_problem(); spec = p.spec
params = SolverParams(
    max_solver_iters=100, unconstrained_solver_max_iters=10,
    max_backtracking_steps=100, initial_alpha_scaling=0.1,
    convergence_tolerance=1.0, expected_decrease_fraction=0.001)
import os as _os
B = int(_os.environ.get("PT_BATCH", "256"))
rng = np.random.RandomState(0)
x0 = np.tile(np.asarray(p.x0)[None], (B, 1))
x0 += 0.1 * rng.randn(*x0.shape).astype(np.float32)
x0 = jnp.asarray(x0)
dyn, pcs = p.dynamics, p.player_costs

def init(x0_b):
    Bt = x0_b.shape[0]
    al0 = jax.vmap(lambda _: pcost.ALState.init(pcs, spec))(jnp.arange(Bt))
    wop = p.initial_operating_point()
    wst = p.initial_strategy()
    bc = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (Bt,) + a.shape), t)
    return batched._carry0(dyn, pcs, spec, x0_b, bc(wop), bc(wst), al0,
                           128, False, fuse_stages=True)

def steps_fn(prm, K):
    def f(x0_b, fc):
        def body(fc, _):
            fc2 = batched._trip_batched(dyn, pcs, spec, prm, x0_b, fc,
                                        batch_block=128, interpret=False,
                                        fuse_stages=True)
            return batched._bwhere(fc.done, fc, fc2), None
        fc, _ = jax.lax.scan(body, fc, None, length=K)
        return fc
    return jax.jit(f)

# Advance 30 trips to a realistic mid-solve state, collecting ladder
# depth stats (chunks_used per trip) every 5 trips.
fc = jax.jit(init)(x0)
stats_j = jax.jit(lambda x0_b, fc: batched.iteration_step_batched(
    dyn, pcs, spec, params, x0_b, fc.al, fc.c, active=~fc.done,
    batch_block=128, interpret=False, return_stats=True,
    fuse_stages=True))
adv5 = steps_fn(params, 5)
fcs = fc
depths = []
idx_hist = np.zeros(16, np.int64)
for k in range(6):
    _, st = stats_j(x0, fcs)
    depths.append(int(st["chunks_used"]))
    idx = np.asarray(st["idx"])[np.asarray(st["passed"])]
    idx_hist += np.bincount(np.minimum(idx, 15), minlength=16)
    fcs = adv5(x0, fcs)
fc30 = fcs
jax.block_until_ready(fc30.done)
rec(stage="ladder_depths_trips_0_5_10_15_20_25", depths=depths)
rec(stage="selected_idx_hist_capped15", hist=idx_hist.tolist())
rec(stage="advanced30", done=int(jnp.sum(fc30.done)),
    inner=float(jnp.mean(fc30.inner_iters)),
    nan_lanes=int(jnp.sum(jnp.isnan(fc30.c.last_merit))),
    mean_merit=float(jnp.nanmean(jnp.where(jnp.isinf(fc30.c.last_merit),
                                           jnp.nan, fc30.c.last_merit))))

def per_trip_ms(prm, label):
    t_by_k = {}
    for K in (5, 25):
        f = steps_fn(prm, K)
        r = f(x0, fc30); jax.block_until_ready(r.done)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(x0, fc30); jax.block_until_ready(r.done)
            best = min(best, time.perf_counter() - t0)
        t_by_k[K] = best
    ms = (t_by_k[25] - t_by_k[5]) / 20 * 1e3
    rec(stage=label, per_trip_ms=round(ms, 1),
        t5_s=round(t_by_k[5], 2), t25_s=round(t_by_k[25], 2))
    return ms

base = per_trip_ms(params, "trip_full")

# Ablation 1: no stage 2 (cap the evaluated ladder at the stage-1 width).
p_ns2 = dataclasses.replace(params, linesearch_eval_cap=8)
per_trip_ms(p_ns2, "trip_nostage2")

# Ablation 2: single 40-wide stage (no cond, one sweep call of C=40).
p_one = dataclasses.replace(params)  # same params; widen stage1
def steps_one(K):
    def f(x0_b, fc):
        def body(fc, _):
            c2 = batched.iteration_step_batched(
                dyn, pcs, spec, params, x0_b, fc.al, fc.c,
                active=~fc.done, batch_block=128, interpret=False,
                stage1_cands=40, fuse_stages=True)
            # reuse the rest of the trip via _trip_batched? simpler: just
            # time the iteration step alone in this variant.
            return fc.replace(c=c2), None
        fc, _ = jax.lax.scan(body, fc, None, length=K)
        return fc
    return jax.jit(f)
for K in (5, 25):
    f = steps_one(K)
    r = f(x0, fc30); jax.block_until_ready(r.done)
t5 = t25 = None
f5, f25 = steps_one(5), steps_one(25)
best5 = best25 = np.inf
for _ in range(3):
    t0 = time.perf_counter(); r = f5(x0, fc30); jax.block_until_ready(r.done)
    best5 = min(best5, time.perf_counter() - t0)
    t0 = time.perf_counter(); r = f25(x0, fc30); jax.block_until_ready(r.done)
    best25 = min(best25, time.perf_counter() - t0)
rec(stage="iterstep_onewide40", per_trip_ms=round((best25-best5)/20*1e3, 1))

# Ablation 3: iteration step only (no AL bookkeeping / reinit cond).
def steps_iter(K, stage1=8):
    def f(x0_b, fc):
        def body(fc, _):
            c2 = batched.iteration_step_batched(
                dyn, pcs, spec, params, x0_b, fc.al, fc.c,
                active=~fc.done, batch_block=128, interpret=False,
                stage1_cands=stage1, fuse_stages=True)
            return fc.replace(c=c2), None
        fc, _ = jax.lax.scan(body, fc, None, length=K)
        return fc
    return jax.jit(f)
f5, f25 = steps_iter(5), steps_iter(25)
for f in (f5, f25):
    r = f(x0, fc30); jax.block_until_ready(r.done)
best5 = best25 = np.inf
for _ in range(3):
    t0 = time.perf_counter(); r = f5(x0, fc30); jax.block_until_ready(r.done)
    best5 = min(best5, time.perf_counter() - t0)
    t0 = time.perf_counter(); r = f25(x0, fc30); jax.block_until_ready(r.done)
    best25 = min(best25, time.perf_counter() - t0)
rec(stage="iterstep_staged8", per_trip_ms=round((best25-best5)/20*1e3, 1))

# Chunk-width sweep of the FULL trip (sweep_width.txt showed one C=1
# chunk costs 4.6 ms vs 30 ms at C=8; whether narrow wins end-to-end
# depends on the ladder-depth distribution above).
import os
widths = [int(w) for w in
          os.environ.get("PT_WIDTHS", "1,2,4").split(",") if w]
for w in widths:
    pw = dataclasses.replace(params, linesearch_chunk=w)
    per_trip_ms(pw, f"trip_full_chunk{w}")

rec(stage="done")
