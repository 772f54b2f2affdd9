"""Where do ~10 ms/call go in the composed emit+XLA-merit sweep? (6c)

kernel_profile6.txt (new path): sweep_c8 (one 128-lane block) costs
10.3 ms/call while its parts measured 0.06 ms (emit, floor5i) + 0.25 ms
(merit share). Suspect: a layout conversion between the pallas 4D output
and the lax.scan consumer. Cases (all Bb=128, C=8, N=100, one block):

  a_emit_only     jit(pallas emit)        -> xs/us candidates
  b_merit_only    jit(_xla_merits) on device-resident candidate arrays
  c_composed      jit(emit + merit)       == production sweep_merits_bm
  d_merit_vmapN   merit with vmap-over-N + masked sum (no scan; fold
                  order differs — diagnostic only)
  e_dispatch      jit(lambda x: x + 1) on [8,128] — per-call floor

JSON to tools/kernel_profile6c.txt. Run alone on the TPU.
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

from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas import sweep as sweep_mod
from ilqgames_tpu.ops.pallas.sweep import _run, _xla_merits, sweep_merits_bm

OUT = "/root/repo/tools/kernel_profile6c.txt"
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


f_emit = jax.jit(emit)
cs, rs = timeit(f_emit, x0m, op, st, scal)
rec(stage="a_emit_only", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3))

xs_cand, us_cand = jax.block_until_ready(f_emit(x0m, op, st, scal))

f_merit = jax.jit(lambda xc, uc, t0, ls, m, g: _xla_merits(
    pcs, spec, xc, uc, t0, ls, None, m, g))
cs, rs = timeit(f_merit, xs_cand, us_cand, op["t0"], lamS, mu, gate)
rec(stage="b_merit_only", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3))

f_comp = jax.jit(lambda *a: sweep_merits_bm(
    dyn, pcs, spec, a[0], a[1], a[2], a[3], a[4], None, a[5], a[6],
    batch_block=Bb))
cs, rs = timeit(f_comp, x0m, op, st, scal, lamS, mu, gate)
rec(stage="c_composed", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3))


def merit_vmapN(xc, uc, t0, ls, m, g):
    import numpy as _np
    from ilqgames_tpu.costs import player_cost as pcost
    sc_off = _np.cumsum([0] + n_sc)
    ts = t0[0][None, :] + jnp.arange(N, dtype=jnp.float32)[:, None] * spec.dt

    def knot(t_b, xk, uk, lamS_k, gate_k):
        lst = tuple(lamS_k[sc_off[p_]:sc_off[p_ + 1]] for p_ in range(P))
        lct = tuple(jnp.zeros((0, Bb), jnp.float32) for _ in range(P))

        def core(tt, xx, uu, ls_, lc_, mm):
            return pcost.stage_gradient_sq_tuple(
                pcs, spec, ls_, lc_, mm, tt, xx, uu)
        inner = jax.vmap(core, in_axes=(0, -1, -1, -1, -1, 0),
                         out_axes=-1)
        outer = jax.vmap(inner, in_axes=(None, 1, 2, None, None, None),
                         out_axes=0)
        s_cb, r_cb = outer(t_b, xk, uk.reshape(P, u, C, Bb), lst, lct,
                           m[0])
        state = s_cb[0] * gate_k[0][None, :]
        ctrl = r_cb[0]
        for p_ in range(1, P):
            state = state + s_cb[p_] * gate_k[p_][None, :]
            ctrl = ctrl + r_cb[p_]
        return state, ctrl

    states, ctrls = jax.vmap(knot)(ts, xc, uc, ls, g)  # [N, C, B]
    return jnp.sum(ctrls, axis=0) + jnp.sum(states[1:], axis=0)


f_vm = jax.jit(merit_vmapN)
cs, rs = timeit(f_vm, xs_cand, us_cand, op["t0"], lamS, mu, gate)
rec(stage="d_merit_vmapN", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3))

f_e = jax.jit(lambda z: z + 1.0)
zz = jnp.ones((8, 128), jnp.float32)
cs, rs = timeit(f_e, zz, reps=50)
rec(stage="e_dispatch", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3))

rec(stage="done")
