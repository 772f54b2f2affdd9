"""Is the ~100 us/knot merit cliff VALUE-dependent (inf/NaN slow paths)?

kernel_profile6e.txt: emit+merit composed = 10.2 ms, same merit on randn
parameter arrays = 1.7 ms, and the overhead rate (~92 us/knot) matches
the in-kernel merit cliff. Random-strategy rollouts diverge to inf/NaN
within a few RK4 steps — every slow case consumed diverged
trajectories, every fast case consumed clean randn. Cases:

  x0_finite_check  fraction of non-finite values in the emitted
                   trajectories (random strategy vs zero strategy)
  x1_param_emitted jit(merit) on the ACTUAL emitted (diverged) arrays
                   passed as parameters — graph identical to the fast
                   w3, values diverged
  x2_composed_zero emit+merit composed, zero strategy (finite rollout)
  x3_param_randn   jit(merit) on randn arrays (control, = w3 rate)

JSON to tools/kernel_profile6f.txt. Run alone on the TPU.
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

OUT = "/root/repo/tools/kernel_profile6f.txt"
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
st_rand = {
    "Ps": jnp.asarray(0.01 * rng.randn(N, Pu, x, Bb).astype(np.float32)),
    "alphas": jnp.asarray(0.01 * rng.randn(N, Pu, Bb).astype(np.float32)),
}
st_zero = {
    "Ps": jnp.zeros((N, Pu, x, Bb), jnp.float32),
    "alphas": jnp.zeros((N, Pu, Bb), jnp.float32),
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


def knot_terms(t_b, xk, uk, lamS_k, gate_k):
    ls = tuple(lamS_k[sc_off[p_]:sc_off[p_ + 1]] for p_ in range(P))
    lc = tuple(jnp.zeros((0, Bb), jnp.float32) for _ in range(P))

    def core(tt, xx, uu, ls_, lc_, mm):
        return pcost.stage_gradient_sq_tuple(
            pcs, spec, ls_, lc_, mm, tt, xx, uu)
    inner = jax.vmap(core, in_axes=(0, -1, -1, -1, -1, 0), out_axes=-1)
    outer = jax.vmap(inner, in_axes=(None, 1, 2, None, None, None),
                     out_axes=0)
    s_cb, r_cb = outer(t_b, xk, uk.reshape(P, u, C, Bb), ls, lc, mu[0])
    state = s_cb[0] * gate_k[0][None, :]
    ctrl = r_cb[0]
    for p_ in range(1, P):
        state = state + s_cb[p_] * gate_k[p_][None, :]
        ctrl = ctrl + r_cb[p_]
    return state, ctrl


def merit_scan(xc, uc, t0):
    ts = t0[0][None, :] + (
        jnp.arange(N, dtype=jnp.float32)[:, None] * spec.dt)

    def body(carry, args):
        k, merit = carry
        t_b, xk, uk, lamS_k, gate_k = args
        state, ctrl = knot_terms(t_b, xk, uk, lamS_k, gate_k)
        inc = ctrl + jnp.where(k > 0, state, 0.0)
        return (k + 1, merit + inc), None
    (_, merits), _ = jax.lax.scan(
        body, (jnp.zeros((), jnp.int32), jnp.zeros((C, Bb), jnp.float32)),
        (ts, xc, uc, lamS, gate))
    return merits


f_emit = jax.jit(emit)
xc_r, uc_r = jax.block_until_ready(f_emit(x0m, op, st_rand, scal))
xc_z, uc_z = jax.block_until_ready(f_emit(x0m, op, st_zero, scal))
nf_r = float(1.0 - jnp.isfinite(xc_r).mean())
nf_z = float(1.0 - jnp.isfinite(xc_z).mean())
amax_z = float(jnp.nanmax(jnp.abs(jnp.where(jnp.isfinite(xc_z), xc_z,
                                            0.0))))
rec(stage="x0_finite_check", nonfinite_rand=round(nf_r, 4),
    nonfinite_zero=round(nf_z, 4), absmax_zero=round(amax_z, 1))

f_m = jax.jit(merit_scan)
cs, rs = timeit(f_m, xc_r, uc_r, op["t0"])
rec(stage="x1_param_emitted", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3))


def composed(x0m_, op_, st_, scal_):
    xc, uc = emit(x0m_, op_, st_, scal_)
    return merit_scan(xc, uc, op_["t0"])


f_c = jax.jit(composed)
cs, rs = timeit(f_c, x0m, op, st_zero, scal)
rec(stage="x2_composed_zero", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3))

xs_cand = jnp.asarray(rng.randn(N, x, C, Bb).astype(np.float32))
us_cand = jnp.asarray(0.01 * rng.randn(N, Pu, C, Bb).astype(np.float32))
cs, rs = timeit(f_m, xs_cand, us_cand, op["t0"])
rec(stage="x3_param_randn", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3))

rec(stage="done")
