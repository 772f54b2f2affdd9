"""Kill the ~9 ms relayout between the pallas emit and the XLA merit
when composed in one jit (kernel_profile6c.txt: parts 0.05 + 1.4 ms,
composed 10.3 ms). Composed variants (one 128-lane block, C=8):

  v1_scan        emit + scan-fold merit (production today; baseline)
  v2_vmap_scan   emit + vmap-over-N per-knot incs + scan-fold of incs
                 (exact same fold order, scan body is one add)
  v3_vmap_sum    emit + vmap incs + jnp.sum (fold order differs; diag)
  v4_barrier     v1 with optimization_barrier between emit and merit
  v5_reshape     v1 with a flatten/unflatten reshape pair between

JSON to tools/kernel_profile6d.txt. Run alone on the TPU.
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

OUT = "/root/repo/tools/kernel_profile6d.txt"
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

op = {
    "xs": jnp.asarray(rng.randn(N, x, Bb).astype(np.float32)),
    "us": jnp.asarray(0.01 * rng.randn(N, Pu, Bb).astype(np.float32)),
    "t0": jnp.zeros((1, Bb), jnp.float32),
}
st = {
    "Ps": jnp.asarray(0.01 * rng.randn(N, Pu, x, Bb).astype(np.float32)),
    "alphas": jnp.asarray(0.01 * rng.randn(N, Pu, Bb).astype(np.float32)),
}
x0m = jnp.asarray(rng.randn(x, Bb).astype(np.float32))
lamS = jnp.asarray(0.1 * rng.rand(N, nS, Bb).astype(np.float32))
mu = 10.0 * jnp.ones((1, Bb), jnp.float32)
gate = jnp.ones((N, P, Bb), jnp.float32)
scal = jnp.broadcast_to(
    jnp.asarray(0.1 * 0.5 ** np.arange(C, dtype=np.float32))[:, None],
    (C, Bb))


def emit(x0m_, op_, st_, scal_):
    return _run(dyn, None, spec, x0m_, op_, st_, scal_, None, None,
                None, None, compute_merit=False, emit_traj=True,
                batch_block=Bb, interpret=False)


def grads_outer(t_b, xk, uk, ls, lc, m):
    def core(tt, xx, uu, ls_, lc_, mm):
        return pcost.stage_gradient_sq_tuple(
            pcs, spec, ls_, lc_, mm, tt, xx, uu)
    inner = jax.vmap(core, in_axes=(0, -1, -1, -1, -1, 0), out_axes=-1)
    outer = jax.vmap(inner, in_axes=(None, 1, 2, None, None, None),
                     out_axes=0)
    return outer(t_b, xk, uk, ls, lc, m)


def knot_terms(t_b, xk, uk, lamS_k, gate_k):
    ls = tuple(lamS_k[sc_off[p_]:sc_off[p_ + 1]] for p_ in range(P))
    lc = tuple(jnp.zeros((0, Bb), jnp.float32) for _ in range(P))
    s_cb, r_cb = grads_outer(t_b, xk, uk.reshape(P, u, C, Bb), ls, lc,
                             mu[0])
    state = s_cb[0] * gate_k[0][None, :]
    ctrl = r_cb[0]
    for p_ in range(1, P):
        state = state + s_cb[p_] * gate_k[p_][None, :]
        ctrl = ctrl + r_cb[p_]
    return state, ctrl


def ts_of(t0):
    return t0[0][None, :] + (
        jnp.arange(N, dtype=jnp.float32)[:, None] * spec.dt)


def merit_scan(xc, uc, t0):
    def body(carry, args):
        k, merit = carry
        t_b, xk, uk, lamS_k, gate_k = args
        state, ctrl = knot_terms(t_b, xk, uk, lamS_k, gate_k)
        inc = ctrl + jnp.where(k > 0, state, 0.0)
        return (k + 1, merit + inc), None
    (_, merits), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.int32), jnp.zeros((C, Bb), jnp.float32)),
        (ts_of(t0), xc, uc, lamS, gate))
    return merits


def merit_vmap_scan(xc, uc, t0):
    states, ctrls = jax.vmap(knot_terms)(ts_of(t0), xc, uc, lamS, gate)
    incs = ctrls.at[1:].add(states[1:])

    def body(m, inc):
        return m + inc, None
    merits, _ = jax.lax.scan(
        body, jnp.zeros((C, Bb), jnp.float32), incs)
    return merits


def merit_vmap_sum(xc, uc, t0):
    states, ctrls = jax.vmap(knot_terms)(ts_of(t0), xc, uc, lamS, gate)
    return jnp.sum(ctrls, axis=0) + jnp.sum(states[1:], axis=0)


def v1(x0m_, op_, st_, scal_):
    xc, uc = emit(x0m_, op_, st_, scal_)
    return merit_scan(xc, uc, op_["t0"])


def v2(x0m_, op_, st_, scal_):
    xc, uc = emit(x0m_, op_, st_, scal_)
    return merit_vmap_scan(xc, uc, op_["t0"])


def v3(x0m_, op_, st_, scal_):
    xc, uc = emit(x0m_, op_, st_, scal_)
    return merit_vmap_sum(xc, uc, op_["t0"])


def v4(x0m_, op_, st_, scal_):
    xc, uc = emit(x0m_, op_, st_, scal_)
    xc, uc = jax.lax.optimization_barrier((xc, uc))
    return merit_scan(xc, uc, op_["t0"])


def v5(x0m_, op_, st_, scal_):
    xc, uc = emit(x0m_, op_, st_, scal_)
    xc = xc.reshape(N, x * C * Bb).reshape(N, x, C, Bb)
    uc = uc.reshape(N, Pu * C * Bb).reshape(N, Pu, C, Bb)
    return merit_scan(xc, uc, op_["t0"])


for name, fn in (("v1_scan", v1), ("v2_vmap_scan", v2),
                 ("v3_vmap_sum", v3), ("v4_barrier", v4),
                 ("v5_reshape", v5)):
    f = jax.jit(fn)
    cs, rs = timeit(f, x0m, op, st, scal)
    rec(stage=name, compile_s=round(cs, 1),
        per_call_ms=round(rs * 1e3, 3))

rec(stage="done")
