"""What exactly costs ~10 ms when pallas emit + XLA merit share a jit?

kernel_profile6d.txt: every composed variant = 10.1 ms (parts: 0.05 +
1.4). Cases:

  w1_emit_sum      emit + xc.sum() + uc.sum() (trivial consumer)
  w2_emit_slice    emit + xc[0].sum() (tiny consumer)
  w3_xla_producer  (xc, uc as params) * 1.0000001 -> merit_scan
                   (same merit graph, XLA producer instead of pallas)
  w4_small_n       emit + merit at N=10 (size scaling of the overhead)
  w5_emit_c1_sum   C=1 emit + xc.sum() (reroll-shaped trivial consumer)

JSON to tools/kernel_profile6e.txt. Run alone on the TPU.
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
from ilqgames_tpu.ops.pallas.sweep import _run

OUT = "/root/repo/tools/kernel_profile6e.txt"
Bb = 128
C = 8


def rec(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def timeit(fn, *args, reps=20):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return compile_s, (time.perf_counter() - t0) / reps


problem = make_problem()
dyn, spec, pcs = problem.dynamics, problem.spec, problem.player_costs
N = spec.num_time_steps
x = spec.xdim
P = spec.num_players
u = spec.umax
Pu = P * u
rng = np.random.RandomState(0)
n_sc = [len(pc.state_constraints) for pc in pcs]
nS = sum(n_sc)
sc_off = np.cumsum([0] + n_sc)


def operands(Nn):
    op = {
        "xs": jnp.asarray(rng.randn(Nn, x, Bb).astype(np.float32)),
        "us": jnp.asarray(0.01 * rng.randn(Nn, Pu, Bb).astype(np.float32)),
        "t0": jnp.zeros((1, Bb), jnp.float32),
    }
    st = {
        "Ps": jnp.asarray(
            0.01 * rng.randn(Nn, Pu, x, Bb).astype(np.float32)),
        "alphas": jnp.asarray(
            0.01 * rng.randn(Nn, Pu, Bb).astype(np.float32)),
    }
    x0m = jnp.asarray(rng.randn(x, Bb).astype(np.float32))
    lamS = jnp.asarray(0.1 * rng.rand(Nn, nS, Bb).astype(np.float32))
    mu = 10.0 * jnp.ones((1, Bb), jnp.float32)
    gate = jnp.ones((Nn, P, Bb), jnp.float32)
    return op, st, x0m, lamS, mu, gate


scal = jnp.broadcast_to(
    jnp.asarray(0.1 * 0.5 ** np.arange(C, dtype=np.float32))[:, None],
    (C, Bb))
scal1 = 0.5 * jnp.ones((1, Bb), jnp.float32)


def emit(x0m_, op_, st_, scal_, spec_=None):
    return _run(dyn, None, spec_ or spec, x0m_, op_, st_, scal_, None,
                None, None, None, compute_merit=False, emit_traj=True,
                batch_block=Bb, interpret=False)


def make_merit_scan(Nn, Cc, lamS, mu, gate):
    def knot_terms(t_b, xk, uk, lamS_k, gate_k):
        ls = tuple(lamS_k[sc_off[p_]:sc_off[p_ + 1]] for p_ in range(P))
        lc = tuple(jnp.zeros((0, Bb), jnp.float32) for _ in range(P))

        def core(tt, xx, uu, ls_, lc_, mm):
            return pcost.stage_gradient_sq_tuple(
                pcs, spec, ls_, lc_, mm, tt, xx, uu)
        inner = jax.vmap(core, in_axes=(0, -1, -1, -1, -1, 0),
                         out_axes=-1)
        outer = jax.vmap(inner, in_axes=(None, 1, 2, None, None, None),
                         out_axes=0)
        s_cb, r_cb = outer(t_b, xk, uk.reshape(P, u, Cc, Bb), ls, lc,
                           mu[0])
        state = s_cb[0] * gate_k[0][None, :]
        ctrl = r_cb[0]
        for p_ in range(1, P):
            state = state + s_cb[p_] * gate_k[p_][None, :]
            ctrl = ctrl + r_cb[p_]
        return state, ctrl

    def merit_scan(xc, uc, t0):
        ts = t0[0][None, :] + (
            jnp.arange(Nn, dtype=jnp.float32)[:, None] * spec.dt)

        def body(carry, args):
            k, merit = carry
            t_b, xk, uk, lamS_k, gate_k = args
            state, ctrl = knot_terms(t_b, xk, uk, lamS_k, gate_k)
            inc = ctrl + jnp.where(k > 0, state, 0.0)
            return (k + 1, merit + inc), None
        (_, merits), _ = jax.lax.scan(
            body,
            (jnp.zeros((), jnp.int32), jnp.zeros((Cc, Bb), jnp.float32)),
            (ts, xc, uc, lamS, gate))
        return merits
    return merit_scan


op, st, x0m, lamS, mu, gate = operands(N)
merit_scan = make_merit_scan(N, C, lamS, mu, gate)


def w1(x0m_, op_, st_, scal_):
    xc, uc = emit(x0m_, op_, st_, scal_)
    return xc.sum() + uc.sum()


def w2(x0m_, op_, st_, scal_):
    xc, uc = emit(x0m_, op_, st_, scal_)
    return xc[0].sum()


f = jax.jit(w1)
cs, rs = timeit(f, x0m, op, st, scal)
rec(stage="w1_emit_sum", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3))

f = jax.jit(w2)
cs, rs = timeit(f, x0m, op, st, scal)
rec(stage="w2_emit_slice", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3))

xs_cand = jnp.asarray(rng.randn(N, x, C, Bb).astype(np.float32))
us_cand = jnp.asarray(0.01 * rng.randn(N, Pu, C, Bb).astype(np.float32))


def w3(xc, uc, t0):
    return merit_scan(xc * 1.0000001, uc * 1.0000001, t0)


f = jax.jit(w3)
cs, rs = timeit(f, xs_cand, us_cand, op["t0"])
rec(stage="w3_xla_producer", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3))

N10 = 10
spec10 = problem.dynamics.spec(num_time_steps=N10)
op10, st10, x0m10, lamS10, mu10, gate10 = operands(N10)
merit10 = make_merit_scan(N10, C, lamS10, mu10, gate10)


def w4(x0m_, op_, st_, scal_):
    xc, uc = emit(x0m_, op_, st_, scal_, spec_=spec10)
    return merit10(xc, uc, op_["t0"])


f = jax.jit(w4)
cs, rs = timeit(f, x0m10, op10, st10, scal)
rec(stage="w4_small_n", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3))


def w5(x0m_, op_, st_, scal_):
    xc, uc = emit(x0m_, op_, st_, scal_)
    return xc.sum()


f = jax.jit(w5)
cs, rs = timeit(f, x0m, op, st, scal1)
rec(stage="w5_emit_c1_sum", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3))

rec(stage="done")
