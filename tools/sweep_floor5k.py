"""Merit-ONLY pallas kernel over emitted trajectories (part k2).

Current sweep (emit + XLA merit) pays ~1 ms/MB moving the emitted
trajectories into XLA (kernel_profile6k.txt). pallas->pallas handoffs
are untaxed, so if a merit-only Mosaic kernel (read [N,x,C,B] +
[N,Pu,C,B], accumulate gated squared gradients, no rollout) lands in
the fast compile basin, a ladder round becomes emit (0.06 ms) +
merit-kernel instead of 10.3 ms. Chaotic-basin risk documented in
CLAUDE.md; this is a single-shot measurement.

  m1_meritkernel   full flagship content, C=8, Bb=128
  m2_chain         emit-kernel -> merit-kernel chained (production
                   shape), per-call total

JSON to tools/sweep_floor5k.txt. Run alone on the TPU.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas.sweep import _run

OUT = "/root/repo/tools/sweep_floor5k.txt"
Bb = 128
N = 100
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
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return cs, (time.perf_counter() - t0) / reps


problem = make_problem()
dyn, spec, pcs = problem.dynamics, problem.spec, problem.player_costs
x = spec.xdim
P = spec.num_players
u = spec.umax
Pu = P * u
dt = spec.dt
rng = np.random.RandomState(0)
n_sc = [len(pc.state_constraints) for pc in pcs]
n_cc = [len(pc.control_constraints) for pc in pcs]
nS = sum(n_sc)
sc_off = np.cumsum([0] + n_sc)

xc0 = jnp.asarray(rng.randn(N, x, C, Bb).astype(np.float32))
uc0 = jnp.asarray(0.01 * rng.randn(N, Pu, C, Bb).astype(np.float32))
lamS = jnp.asarray(0.1 * rng.rand(N, nS, Bb).astype(np.float32))
gate = jnp.ones((N, P, Bb), jnp.float32)
mu = 10.0 * jnp.ones((1, Bb), jnp.float32)
t0v = jnp.zeros((1, Bb), jnp.float32)


def grads_cb(t, x_cb, us_cb, ls, lc, m):
    def core(tt, xx, uu, l1, l2, mm):
        return pcost.stage_gradient_sq_tuple(
            pcs, spec, l1, l2, mm, tt, xx, uu)
    inner = jax.vmap(core, in_axes=(0, -1, -1, -1, -1, 0), out_axes=-1)
    outer = jax.vmap(inner, in_axes=(None, 1, 2, None, None, None),
                     out_axes=0)
    return outer(t, x_cb, us_cb, ls, lc, m)


def merit_kernel(xc_ref, uc_ref, lamS_ref, gate_ref, mu_ref, t0_ref,
                 merit_ref):
    merit_ref[...] = jnp.zeros_like(merit_ref)

    def step(k, _):
        xk = xc_ref[pl.ds(k, 1)][0]          # [x, C, B]
        uk = uc_ref[pl.ds(k, 1)][0]          # [Pu, C, B]
        t = t0_ref[0] + k.astype(jnp.float32) * dt
        ls = tuple(lamS_ref[pl.ds(k, 1)][0, sc_off[p_]:sc_off[p_ + 1]]
                   for p_ in range(P))
        lc = tuple(jnp.zeros((n_cc[p_], Bb), jnp.float32)
                   for p_ in range(P))
        s_cb, r_cb = grads_cb(t, xk, uk.reshape(P, u, C, Bb), ls, lc,
                              mu_ref[0])
        gate_k = gate_ref[pl.ds(k, 1)][0]
        state_term = s_cb[0] * gate_k[0][None, :]
        ctrl_term = r_cb[0]
        for p_ in range(1, P):
            state_term = state_term + s_cb[p_] * gate_k[p_][None, :]
            ctrl_term = ctrl_term + r_cb[p_]
        merit_ref[...] = merit_ref[...] + ctrl_term + jnp.where(
            k > 0, state_term, 0.0)
        return 0

    jax.lax.fori_loop(0, N, step, 0)


f_merit = jax.jit(lambda *a: pl.pallas_call(
    merit_kernel,
    out_shape=[jax.ShapeDtypeStruct((C, Bb), jnp.float32)],
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)],
    out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024),
)(*a))
cs, rs = timeit(f_merit, xc0, uc0, lamS, gate, mu, t0v)
rec(stage="m1_meritkernel", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3),
    us_per_knot=round(rs / N * 1e6, 2))

op = {"xs": jnp.asarray(rng.randn(N, x, Bb).astype(np.float32)),
      "us": jnp.asarray(0.01 * rng.randn(N, Pu, Bb).astype(np.float32)),
      "t0": t0v}
st = {"Ps": jnp.asarray(0.01 * rng.randn(N, Pu, x, Bb).astype(np.float32)),
      "alphas": jnp.asarray(0.01 * rng.randn(N, Pu, Bb).astype(np.float32))}
x0m = jnp.asarray(rng.randn(x, Bb).astype(np.float32))
scal = jnp.broadcast_to(
    jnp.asarray(0.1 * 0.5 ** np.arange(C, dtype=np.float32))[:, None],
    (C, Bb))
f_emit = jax.jit(lambda x0m_, op_, st_, scal_: _run(
    dyn, None, spec, x0m_, op_, st_, scal_, None, None, None, None,
    compute_merit=False, emit_traj=True, batch_block=Bb,
    interpret=False))


def chain(x0m_, op_, st_, scal_):
    xc, uc = f_emit(x0m_, op_, st_, scal_)
    return f_merit(xc, uc, lamS, gate, mu, op_["t0"])


cs, rs = timeit(chain, x0m, op, st, scal)
rec(stage="m2_chain", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 3))
rec(stage="done")
