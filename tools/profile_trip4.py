"""Round-4 trip decomposition at B=1024 (and the cap/width experiments).

Methodology as profile_trip3.py: jit a lax.scan of K repetitions over a
realistic mid-solve carry, time K=5 vs K=25 blocking once per call;
(t25-t5)/20 = per-rep device time. Isolated kernels are chained through
the scan carry (output feeds a 0-weighted perturbation of the next
input) so XLA cannot elide or overlap them.

Run alone on the TPU: PT_BATCH=1024 python tools/profile_trip4.py
"""
import dataclasses
import functools
import json
import os
import sys
import time

# NOT via PYTHONPATH: an entry in PYTHONPATH breaks the axon TPU
# plugin's backend discovery (verified: with PYTHONPATH=/root/repo set,
# jax.devices() raises "Backend 'axon' is not in the list of known
# backends"); sys.path works fine.
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
from ilqgames_tpu.ops.pallas.layout import bm, mb, pad_batch
from ilqgames_tpu.ops.pallas.lq import solve_lq_feedback_bm
from ilqgames_tpu.ops.pallas.stage import lin_quad_pallas
from ilqgames_tpu.ops.pallas.sweep import _prep_al, _prep_common, \
    rollout_bm, sweep_merits_bm
from ilqgames_tpu.solver import batched
from ilqgames_tpu.solver.params import SolverParams

OUT = "/root/repo/tools/profile_trip4.txt"


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
rec(stage="start", B=B)


def init(x0_b):
    Bt = x0_b.shape[0]
    al0 = jax.vmap(lambda _: pcost.ALState.init(pcs, spec))(jnp.arange(Bt))
    wop = p.initial_operating_point()
    wst = p.initial_strategy()
    bc = lambda t: jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a[None], (Bt,) + a.shape), t)
    return batched._carry0(dyn, pcs, spec, x0_b, bc(wop), bc(wst), al0,
                           Bb, False, fuse_stages=True)


def steps_fn(prm, K):
    def f(x0_b, fc):
        def body(fc, _):
            fc2 = batched._trip_batched(dyn, pcs, spec, prm, x0_b, fc,
                                        batch_block=Bb, interpret=False,
                                        fuse_stages=True)
            return batched._bwhere(fc.done, fc, fc2), None
        fc, _ = jax.lax.scan(body, fc, None, length=K)
        return fc
    return jax.jit(f)


# ---- advance to a realistic mid-solve state, with ladder stats ----
fc = jax.jit(init)(x0)
stats_j = jax.jit(lambda x0_b, fc: batched.iteration_step_batched(
    dyn, pcs, spec, params, x0_b, fc.al, fc.c, active=~fc.done,
    batch_block=Bb, interpret=False, return_stats=True,
    fuse_stages=True))
adv5 = steps_fn(params, 5)
fcs = fc
depths, unhappy_counts = [], []
idx_hist = np.zeros(16, np.int64)
for k in range(6):
    _, st = stats_j(x0, fcs)
    depths.append(int(st["chunks_used"]))
    passed = np.asarray(st["passed"])
    active = ~np.asarray(fcs.done)
    unhappy_counts.append(int((~passed & active).sum()))
    idx = np.asarray(st["idx"])[passed]
    idx_hist += np.bincount(np.minimum(idx, 15), minlength=16)
    fcs = adv5(x0, fcs)
fc30 = fcs
jax.block_until_ready(fc30.done)
rec(stage="ladder_stats", depths=depths, unhappy=unhappy_counts,
    idx_hist=idx_hist.tolist())


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


def trip_time(prm, label):
    def mk(K):
        f = steps_fn(prm, K)
        return lambda: f(x0, fc30).done
    return diff_time(mk, label)


# ---- full trip + param variants ----
trip_time(params, "trip_full")
trip_time(dataclasses.replace(params, linesearch_eval_cap=1),
          "trip_ladder_off_ABLATION_ONLY")
trip_time(dataclasses.replace(params, linesearch_eval_cap=25),
          "trip_cap25")
trip_time(dataclasses.replace(params, linesearch_eval_cap=33),
          "trip_cap33")
trip_time(dataclasses.replace(params, linesearch_deep_chunk=16),
          "trip_deep16")

# ---- isolated kernels on the fc30 state ----
gate = batched._extreme_gate_b(pcs, spec, fc30.c.extreme_ks)
op_bm_h, _, x0m = _prep_common(spec, x0, fc30.c.op, fc30.c.strategy, Bb)
op_bm = {"xs": op_bm_h["xs"], "us": op_bm_h["us"], "t0": op_bm_h["t0"]}
lamS, lamC, mu_bm, gate_bm = _prep_al(spec, fc30.al, gate, Bb)

N = spec.num_time_steps
P = spec.num_players
xd = spec.xdim
Pu = P * spec.umax
Bp = x0m.shape[-1]

ops0 = jax.jit(lambda: lin_quad_pallas(
    dyn, pcs, spec, op_bm, lamS, lamC, mu_bm, gate_bm,
    batch_block=Bb))()
jax.block_until_ready(ops0["A"])
Ps_r0, al_r0, _ = jax.jit(lambda: solve_lq_feedback_bm(
    spec, ops0, x0m - op_bm["xs"][0], adaptive_regularization=True,
    batch_block=Bb))()
st_bm = {
    "Ps": jnp.concatenate([Ps_r0, jnp.zeros((1, Pu, xd, Bp), jnp.float32)]),
    "alphas": jnp.concatenate([al_r0, jnp.zeros((1, Pu, Bp), jnp.float32)]),
}
jax.block_until_ready(st_bm["Ps"])


def chain(fn_of_eps, out_scalar):
    """K-rep scan with a data dependency: out feeds eps of next input."""
    def mk(K):
        def f(eps0):
            def body(eps, _):
                out = fn_of_eps(eps)
                return out_scalar(out) * 1e-30, None
            e, _ = jax.lax.scan(body, eps0, None, length=K)
            return e
        fj = jax.jit(f)
        return lambda: fj(jnp.float32(0.0))
    return mk


diff_time(chain(
    lambda e: lin_quad_pallas(
        dyn, pcs, spec,
        {"xs": op_bm["xs"] + e, "us": op_bm["us"], "t0": op_bm["t0"]},
        lamS, lamC, mu_bm, gate_bm, batch_block=Bb),
    lambda o: o["A"][0, 0, 0, 0]), "kernel_stage")

diff_time(chain(
    lambda e: solve_lq_feedback_bm(
        spec, {**ops0, "A": ops0["A"] + e}, x0m - op_bm["xs"][0],
        adaptive_regularization=True, batch_block=Bb),
    lambda o: o[0][0, 0, 0, 0]), "kernel_lq")

scal1 = jnp.full((1,), params.initial_alpha_scaling, jnp.float32)
diff_time(chain(
    lambda e: sweep_merits_bm(
        dyn, pcs, spec, x0m + e, op_bm, st_bm, scal1,
        lamS, lamC, mu_bm, gate_bm, batch_block=Bb),
    lambda m: m[0, 0]), "kernel_sweep_C1_fullbatch")

scal8 = params.initial_alpha_scaling * (0.5 ** jnp.arange(8, dtype=jnp.float32))
g128 = lambda a: None if a is None else a[..., :128]
diff_time(chain(
    lambda e: sweep_merits_bm(
        dyn, pcs, spec, g128(x0m) + e, {k: g128(v) for k, v in op_bm.items()},
        {k: g128(v) for k, v in st_bm.items()}, scal8,
        g128(lamS), g128(lamC), g128(mu_bm), g128(gate_bm), batch_block=128),
    lambda m: m[0, 0]), "kernel_sweep_C8_oneblock")

scal_bm1 = jnp.ones((1, Bp), jnp.float32) * params.initial_alpha_scaling
diff_time(chain(
    lambda e: rollout_bm(dyn, spec, x0m + e, op_bm, st_bm, scal_bm1,
                         batch_block=Bb),
    lambda o: o[0][0, 0, 0]), "kernel_reroll_fullbatch")

# ---- merit-collapse check: full 40-candidate ladder on one gathered
# block; smallest K with bitwise-constant merits from K on ----
scal40 = params.initial_alpha_scaling * (
    0.5 ** jnp.arange(40, dtype=jnp.float32))
m40 = jax.jit(lambda: sweep_merits_bm(
    dyn, pcs, spec, g128(x0m), {k: g128(v) for k, v in op_bm.items()},
    {k: g128(v) for k, v in st_bm.items()}, scal40,
    g128(lamS), g128(lamC), g128(mu_bm), g128(gate_bm),
    batch_block=128))()
m40 = np.asarray(m40)  # [40, 128]
last = m40[-1]
collapse_k = np.full(128, 0)
for lane in range(128):
    k = 40
    while k > 0 and m40[k - 1, lane] == last[lane]:
        k -= 1
    collapse_k[lane] = k  # merits constant from k onward (bitwise)
rec(stage="merit_collapse", max_k=int(collapse_k.max()),
    p99=int(np.percentile(collapse_k, 99)),
    hist=np.bincount(np.minimum(collapse_k, 39), minlength=40).tolist())

rec(stage="done")
