"""Part 2 of the round-4 B=1024 profile: isolated kernels + merit
collapse. Split from profile_trip4.py after its chained-kernel timers
crashed the axon remote-compile path with HTTP 413 (closed-over arrays
become HLO literals; here every operand is a jit ARGUMENT).

Run alone on the TPU: python tools/profile_trip4b.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

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

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas.layout import bm, pad_batch
from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_bm
from ilqgames_tpu.ops.pallas.stage import lin_quad_pallas
from ilqgames_tpu.ops.pallas.sweep import _prep_al, _prep_common, \
    rollout_bm, sweep_merits_bm
from ilqgames_tpu.solver import batched
from ilqgames_tpu.solver.params import SolverParams

OUT = "/root/repo/tools/profile_trip4b.txt"


def rec(**kw):
    line = json.dumps(kw); print(line, flush=True)
    with open(OUT, "a") as f: f.write(line + "\n")


p = make_problem(); spec = p.spec
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
rec(stage="start_b", B=B)


def init(x0_b):
    Bt = x0_b.shape[0]
    al0 = jax.vmap(lambda _: pcost.ALState.init(pcs, spec))(jnp.arange(Bt))
    wop = p.initial_operating_point()
    wst = p.initial_strategy()
    bc = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (Bt,) + a.shape), t)
    return batched._carry0(dyn, pcs, spec, x0_b, bc(wop), bc(wst), al0,
                           Bb, False, fuse_stages=True)


def steps_fn(K):
    def f(x0_b, fc):
        def body(fc, _):
            fc2 = batched._trip_batched(dyn, pcs, spec, params, x0_b, fc,
                                        batch_block=Bb, interpret=False,
                                        fuse_stages=True)
            return batched._bwhere(fc.done, fc, fc2), None
        fc, _ = jax.lax.scan(body, fc, None, length=K)
        return fc
    return jax.jit(f)


fc = jax.jit(init)(x0)
fc30 = steps_fn(25)(x0, steps_fn(5)(x0, fc))
jax.block_until_ready(fc30.done)
rec(stage="advanced30")

gate = batched._extreme_gate_b(pcs, spec, fc30.c.extreme_ks)
op_bm_h, _, x0m = _prep_common(spec, x0, fc30.c.op, fc30.c.strategy, Bb)
op_bm = {"xs": op_bm_h["xs"], "us": op_bm_h["us"], "t0": op_bm_h["t0"]}
lamS, lamC, mu_bm, gate_bm = _prep_al(spec, fc30.al, gate, Bb)

N = spec.num_time_steps
P = spec.num_players
xd = spec.xdim
Pu = P * spec.umax
Bp = x0m.shape[-1]

ops0 = jax.jit(
    lambda o, lS, lC, m, g: lin_quad_pallas(
        dyn, pcs, spec, o, lS, lC, m, g, batch_block=Bb)
)(op_bm, lamS, lamC, mu_bm, gate_bm)
jax.block_until_ready(ops0["A"])
Ps_r0, al_r0, _ = jax.jit(
    lambda o, d: solve_lq_feedback_bm(
        spec, o, d, adaptive_regularization=True, batch_block=Bb)
)(ops0, x0m - op_bm["xs"][0])
st_bm = {
    "Ps": jnp.concatenate([Ps_r0, jnp.zeros((1, Pu, xd, Bp), jnp.float32)]),
    "alphas": jnp.concatenate([al_r0, jnp.zeros((1, Pu, Bp), jnp.float32)]),
}
jax.block_until_ready(st_bm["Ps"])


def diff_time(make_f, label, ks=(5, 25)):
    t_by_k = {}
    for K in ks:
        f = make_f(K)
        r = f(); jax.block_until_ready(r)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(); jax.block_until_ready(r)
            best = min(best, time.perf_counter() - t0)
        t_by_k[K] = best
    ms = (t_by_k[ks[1]] - t_by_k[ks[0]]) / (ks[1] - ks[0]) * 1e3
    rec(stage=label, per_rep_ms=round(ms, 2),
        t_low_s=round(t_by_k[ks[0]], 2), t_high_s=round(t_by_k[ks[1]], 2))
    return ms


def chain(call, args, out_scalar):
    """K-rep jit with operands as ARGUMENTS (not literals) and a data
    dependency through the scan carry."""
    def mk(K):
        @jax.jit
        def f(eps0, *ops):
            def body(eps, _):
                out = call(eps, *ops)
                return out_scalar(out) * 1e-30, None
            e, _ = jax.lax.scan(body, eps0, None, length=K)
            return e
        return lambda: f(jnp.float32(0.0), *args)
    return mk


diff_time(chain(
    lambda e, o_xs, o_us, o_t0, lS, lC, m, g: lin_quad_pallas(
        dyn, pcs, spec, {"xs": o_xs + e, "us": o_us, "t0": o_t0},
        lS, lC, m, g, batch_block=Bb)["A"],
    (op_bm["xs"], op_bm["us"], op_bm["t0"], lamS, lamC, mu_bm, gate_bm),
    lambda A: A[0, 0, 0, 0]), "kernel_stage")

diff_time(chain(
    lambda e, A, Bf, Qf, lf, Rf, rf, d: solve_lq_feedback_bm(
        spec, {"A": A + e, "Bf": Bf, "Qf": Qf, "lf": lf, "Rf": Rf,
               "rf": rf}, d,
        adaptive_regularization=True, batch_block=Bb)[0],
    (ops0["A"], ops0["Bf"], ops0["Qf"], ops0["lf"], ops0["Rf"],
     ops0["rf"], x0m - op_bm["xs"][0]),
    lambda Ps_r: Ps_r[0, 0, 0, 0]), "kernel_lq")

scal1 = jnp.full((1,), params.initial_alpha_scaling, jnp.float32)
diff_time(chain(
    lambda e, xm, o_xs, o_us, o_t0, sP, sa, lS, lC, m, g: sweep_merits_bm(
        dyn, pcs, spec, xm + e, {"xs": o_xs, "us": o_us, "t0": o_t0},
        {"Ps": sP, "alphas": sa}, scal1, lS, lC, m, g, batch_block=Bb),
    (x0m, op_bm["xs"], op_bm["us"], op_bm["t0"], st_bm["Ps"],
     st_bm["alphas"], lamS, lamC, mu_bm, gate_bm),
    lambda mm: mm[0, 0]), "kernel_sweep_C1_fullbatch")

scal8 = params.initial_alpha_scaling * (
    0.5 ** jnp.arange(8, dtype=jnp.float32))
g128 = lambda a: None if a is None else a[..., :128]
args128 = (g128(x0m), g128(op_bm["xs"]), g128(op_bm["us"]),
           g128(op_bm["t0"]), g128(st_bm["Ps"]), g128(st_bm["alphas"]),
           g128(lamS), g128(lamC), g128(mu_bm), g128(gate_bm))
diff_time(chain(
    lambda e, xm, o_xs, o_us, o_t0, sP, sa, lS, lC, m, g: sweep_merits_bm(
        dyn, pcs, spec, xm + e, {"xs": o_xs, "us": o_us, "t0": o_t0},
        {"Ps": sP, "alphas": sa}, scal8, lS, lC, m, g, batch_block=128),
    args128, lambda mm: mm[0, 0]), "kernel_sweep_C8_oneblock")

scal_bm1 = jnp.ones((1, Bp), jnp.float32) * params.initial_alpha_scaling
diff_time(chain(
    lambda e, xm, o_xs, o_us, o_t0, sP, sa: rollout_bm(
        dyn, spec, xm + e, {"xs": o_xs, "us": o_us, "t0": o_t0},
        {"Ps": sP, "alphas": sa}, scal_bm1, batch_block=Bb)[0],
    (x0m, op_bm["xs"], op_bm["us"], op_bm["t0"], st_bm["Ps"],
     st_bm["alphas"]),
    lambda xs_r: xs_r[0, 0, 0]), "kernel_reroll_fullbatch")

# ---- merit-collapse: full 40-candidate ladder on one gathered block ----
scal40 = params.initial_alpha_scaling * (
    0.5 ** jnp.arange(40, dtype=jnp.float32))
m40 = jax.jit(
    lambda xm, o_xs, o_us, o_t0, sP, sa, lS, lC, m, g: sweep_merits_bm(
        dyn, pcs, spec, xm, {"xs": o_xs, "us": o_us, "t0": o_t0},
        {"Ps": sP, "alphas": sa}, scal40, lS, lC, m, g, batch_block=128)
)(*args128)
m40 = np.asarray(m40)  # [40, 128]
last = m40[-1]
collapse_k = np.zeros(128, np.int64)
for lane in range(128):
    k = 40
    while k > 0 and m40[k - 1, lane] == last[lane]:
        k -= 1
    collapse_k[lane] = k
rec(stage="merit_collapse", max_k=int(collapse_k.max()),
    p99=int(np.percentile(collapse_k, 99)),
    hist=np.bincount(np.minimum(collapse_k, 39), minlength=40).tolist())

rec(stage="done")
