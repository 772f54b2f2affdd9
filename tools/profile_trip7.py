"""Round-5 trip decomposition at B=1024: per-kernel timings on a
realistic mid-solve state + scan-differenced full trip.

Splits the post-collapse-exit trip into its device programs:
stage kernel (fused lin+quad), LQ backward/forward, phase-1 sweep
(C=1), one compact deep round (Bc=128, C=8), reroll, expected-decrease
einsums. Queued-calls methodology (20 calls, one block_until_ready);
big operands passed as jit ARGUMENTS (axon HTTP 413 gotcha).

Run alone on the TPU. Output: tools/profile_trip7.txt.
"""
import functools
import json
import os
import time

import sys
sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
for _i in range(20):
    try:
        jax.devices()
        break
    except RuntimeError:
        time.sleep(15)
import jax.numpy as jnp
import numpy as np

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas.layout import bm, pad_batch
from ilqgames_tpu.ops.pallas import sweep as sweep_mod
from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_bm
from ilqgames_tpu.ops.pallas.stage import lin_quad_pallas
from ilqgames_tpu.solver import batched
from ilqgames_tpu.solver.params import SolverParams

OUT = "/root/repo/tools/profile_trip7.txt"


def rec(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


p = make_problem()
spec = p.spec
params = SolverParams(
    max_solver_iters=100, unconstrained_solver_max_iters=10,
    max_backtracking_steps=100, initial_alpha_scaling=0.1,
    convergence_tolerance=1.0, expected_decrease_fraction=0.001)
B = int(os.environ.get("PT_BATCH", "1024"))
Bb = 128
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
                           Bb, False, fuse_stages=True)


@jax.jit
def advance(x0_b, fc):
    def body(fc, _):
        fc2 = batched._trip_batched(dyn, pcs, spec, params, x0_b, fc,
                                    batch_block=Bb, interpret=False,
                                    fuse_stages=True)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(
                fc.done.reshape((B,) + (1,) * (a.ndim - 1)), a, b),
            fc, fc2), None

    fc, _ = jax.lax.scan(body, fc, None, length=30)
    return fc


fc = init(x0)
fc = advance(x0, fc)
jax.block_until_ready(fc.c.op.xs)
rec(stage="advanced30", done=int(np.asarray(fc.done).sum()))

N, x, P, u = spec.num_time_steps, spec.xdim, spec.num_players, spec.umax
Pu = P * u
gate = batched._extreme_gate_b(pcs, spec, fc.c.extreme_ks)


def timed(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    rec(stage=name, ms=round((time.perf_counter() - t0) / reps * 1e3, 3))
    return out


# ---- batch-minor operands (as iteration_step_batched builds them) ----
@jax.jit
def prep(x0_b, fc, gate):
    op_bm = {
        "xs": pad_batch(bm(fc.c.op.xs), Bb),
        "us": pad_batch(bm(fc.c.op.us).reshape(N, Pu, -1), Bb),
        "t0": pad_batch(bm(fc.c.op.t0)[None], Bb),
    }
    x0m = pad_batch(bm(x0_b), Bb)
    lamS, lamC, mu_bm, gate_bm = sweep_mod._prep_al(spec, fc.al, gate, Bb)
    return op_bm, x0m, lamS, lamC, mu_bm, gate_bm


op_bm, x0m, lamS, lamC, mu_bm, gate_bm = jax.block_until_ready(
    prep(x0, fc, gate))

# 1. Stage kernel (fused linearize + quadraticize).
stage_j = jax.jit(lambda op_bm, lamS, lamC, mu_bm, gate_bm: lin_quad_pallas(
    dyn, pcs, spec, op_bm, lamS, lamC, mu_bm, gate_bm,
    batch_block=Bb, interpret=False))
ops = timed("stage_kernel", stage_j, op_bm, lamS, lamC, mu_bm, gate_bm)

# 2. LQ backward/forward.
lq_j = jax.jit(lambda ops, dx0: solve_lq_feedback_bm(
    spec, ops, dx0, adaptive_regularization=params.adaptive_regularization,
    batch_block=Bb, interpret=False))
Ps_r, al_r, dxs = timed("lq_kernel", lq_j, ops, x0m - op_bm["xs"][0])

Bp = x0m.shape[-1]
st_bm = {
    "Ps": jnp.concatenate([Ps_r, jnp.zeros((1, Pu, x, Bp), jnp.float32)]),
    "alphas": jnp.concatenate([al_r, jnp.zeros((1, Pu, Bp), jnp.float32)]),
}

# 3. Expected decrease einsums.
ed_j = jax.jit(lambda ops, al_r, dxs: batched._expected_decrease_bm(
    spec, ops, al_r, dxs))
timed("expected_decrease", ed_j, ops, al_r, dxs)

# 4. Phase-1 sweep (C=1).
scal1 = jnp.full((1, Bp), 0.1, jnp.float32)
ph1_j = jax.jit(lambda x0m, op_bm, st_bm, scal, lamS, lamC, mu, g:
                sweep_mod.sweep_merits_bm(
                    dyn, pcs, spec, x0m, op_bm, st_bm, scal, lamS, lamC,
                    mu, g, batch_block=Bb, interpret=False))
timed("phase1_sweep_C1", ph1_j, x0m, op_bm, st_bm, scal1, lamS, lamC,
      mu_bm, gate_bm)

# 5. One compact deep round (Bc=128, C=8, per-lane windows).
sel = jnp.arange(128)
scal_w = jnp.broadcast_to(
    jnp.asarray(0.1 * 0.5 ** np.arange(1, 9, dtype=np.float32))[None],
    (128, 8))
g128 = jax.jit(lambda t: jax.tree_util.tree_map(
    lambda a: jnp.take(a, sel, axis=-1), t))
opc = jax.block_until_ready(g128(op_bm))
stc = jax.block_until_ready(g128(st_bm))
deep_j = jax.jit(lambda x0c, opc, stc, sw, lamSc, lamCc, muc, gc:
                 sweep_mod.sweep_merits_bm(
                     dyn, pcs, spec, x0c, opc, stc, sw.T, lamSc, lamCc,
                     muc, gc, batch_block=128, interpret=False))
timed("deep_round_Bc128_C8", deep_j, jnp.take(x0m, sel, -1), opc, stc,
      scal_w, jnp.take(lamS, sel, -1) if lamS is not None else None,
      jnp.take(lamC, sel, -1) if lamC is not None else None,
      jnp.take(mu_bm, sel, -1), jnp.take(gate_bm, sel, -1))

# 6. Reroll (C=1 rollout of the selected candidate).
scal_bm = jnp.full((1, Bp), 0.1, jnp.float32)
rr_j = jax.jit(lambda x0m, op_bm, st_bm, scal: sweep_mod.rollout_bm(
    dyn, spec, x0m, op_bm, st_bm, scal, batch_block=Bb, interpret=False))
timed("reroll_C1", rr_j, x0m, op_bm, st_bm, scal_bm)

# 7. Full trip via scan-length differencing (K=25 vs K=5).
def steps_k(K):
    @jax.jit
    def f(x0_b, fc):
        def body(fc, _):
            fc2 = batched._trip_batched(dyn, pcs, spec, params, x0_b, fc,
                                        batch_block=Bb, interpret=False,
                                        fuse_stages=True)
            return jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    fc.done.reshape((B,) + (1,) * (a.ndim - 1)), a, b),
                fc, fc2), None

        fc, _ = jax.lax.scan(body, fc, None, length=K)
        return fc

    return f


f5, f25 = steps_k(5), steps_k(25)
jax.block_until_ready(f5(x0, fc))
jax.block_until_ready(f25(x0, fc))
t0 = time.perf_counter()
jax.block_until_ready(f5(x0, fc))
t5 = time.perf_counter() - t0
t0 = time.perf_counter()
jax.block_until_ready(f25(x0, fc))
t25 = time.perf_counter() - t0
rec(stage="trip_full_diff", per_trip_ms=round((t25 - t5) / 20 * 1e3, 2),
    t5_s=round(t5, 2), t25_s=round(t25, 2))
rec(stage="done")
