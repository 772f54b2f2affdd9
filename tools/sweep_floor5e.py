"""Find a robustly-fast merit formulation at FULL flagship content.

sweep_floor5c/d.txt: with trivial content, removing ANY of {gate
multiply, where(k>0), output-ref accumulation} flips the kernel from
~100 us/knot to <1; with full content the scratch fix alone does NOT
help. This harness tests exact-semantics reformulations at full content
(real lamS reads, direct output-ref accumulation):

  e1_nogate    state_term summed WITHOUT the gate multiply (valid for
               all-SUM problems where gate == 1 everywhere — the
               flagship and every shipped non-reachability example)
  e2_nowhere   gate kept; knot 0 hoisted OUT of the loop (its inc is
               ctrl-only), loop runs 1..N — removes the where(k>0)
  e3_neither   both of the above (production candidate for all-SUM)
  e4_multwhere gate kept; where -> float(k>0) multiply (diagnostic)

JSON to tools/sweep_floor5e.txt. Run alone on the TPU.
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
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.examples.three_player_intersection import make_problem

OUT = "/root/repo/tools/sweep_floor5e.txt"
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
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return compile_s, (time.perf_counter() - t0) / reps


def run_kernel(kern, operands, out_shape, scratch=()):
    f = jax.jit(lambda *a: pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in operands],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                   for _ in out_shape],
        scratch_shapes=list(scratch),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*a))
    return timeit(f, *operands)


problem = make_problem()
dyn, spec, pcs = problem.dynamics, problem.spec, problem.player_costs
x = spec.xdim
P = spec.num_players
u = spec.umax
Pu = P * u
dt = spec.dt
rng = np.random.RandomState(0)

x0c = jnp.asarray(rng.randn(x, C, Bb).astype(np.float32))
Ps = jnp.asarray(0.01 * rng.randn(N, Pu, x, Bb).astype(np.float32))
al = jnp.asarray(0.01 * rng.randn(N, Pu, Bb).astype(np.float32))
xs_t = jnp.asarray(rng.randn(N, x, Bb).astype(np.float32))
us_t = jnp.asarray(0.01 * rng.randn(N, Pu, Bb).astype(np.float32))
scal = jnp.asarray(0.5 * np.ones((C, Bb), np.float32))
t0v = jnp.zeros((1, Bb), jnp.float32)
gate = jnp.ones((N, P, Bb), jnp.float32)
mu = 10.0 * jnp.ones((1, Bb), jnp.float32)

n_sc = [len(pc.state_constraints) for pc in pcs]
n_cc = [len(pc.control_constraints) for pc in pcs]
nS = sum(n_sc)
lamS_op = jnp.asarray(0.1 * rng.rand(N, nS, Bb).astype(np.float32))
sc_off = np.cumsum([0] + n_sc)

u_mask_flat = np.zeros((Pu,), np.float32)
for i, d in enumerate(spec.udims):
    u_mask_flat[i * u:i * u + d] = 1.0


def integC_lane_t(t, xx, uu):
    one = lambda tt, x_, u_: dyn_base.integrate(dyn, tt, dt, x_, u_)
    inner = jax.vmap(one, in_axes=(0, -1, -1), out_axes=-1)
    return jax.vmap(inner, in_axes=(None, 1, 2), out_axes=1)(t, xx, uu)


def feedback_prod(P_k, a_k, u_ref_k, sc, delta):
    rows = []
    for af in range(Pu):
        acc = P_k[af, 0][None, :] * delta[0]
        for xx_ in range(1, x):
            acc = acc + P_k[af, xx_][None, :] * delta[xx_]
        row = u_ref_k[af][None, :] - acc - sc * a_k[af][None, :]
        rows.append(row * float(u_mask_flat[af]))
    return jnp.stack(rows, 0)


def grads_cb(t, x_cb, us_cb, lamS, lamC, m):
    def core(tt, xx, uu, ls, lc, mm):
        return pcost.stage_gradient_sq_core(
            pcs, spec, ls, lc, mm, tt, xx, uu)
    inner = jax.vmap(core, in_axes=(0, -1, -1, -1, -1, 0), out_axes=-1)
    outer = jax.vmap(inner, in_axes=(None, 1, 2, None, None, None),
                     out_axes=1)
    return outer(t, x_cb, us_cb, lamS, lamC, m)


def make_kernel(use_gate, hoist_k0, mult_where=False):
    def knot_terms(k_f, xc, sc, Ps_k, al_k, xr, ur, gate_k, mu_v, lamS):
        us_flat = feedback_prod(Ps_k, al_k, ur, sc, xc - xr[:, None, :])
        us_cb = us_flat.reshape(P, u, C, Bb)
        lamC = tuple(jnp.zeros((n_cc[p_], Bb), jnp.float32)
                     for p_ in range(P))
        s_cb, r_cb = grads_cb(k_f, xc, us_cb, lamS, lamC, mu_v)
        if use_gate:
            state_term = jnp.sum(s_cb * gate_k[:, None, :], axis=0)
        else:
            state_term = jnp.sum(s_cb, axis=0)
        ctrl_term = jnp.sum(r_cb, axis=0)
        return state_term, ctrl_term, us_cb

    def kern(x_ref, Ps_ref, al_ref, xr_ref, ur_ref, scal_ref, t0_ref,
             gate_ref, lamS_ref, mu_ref, merit_ref, o_ref, xcur):
        sc = scal_ref[...]
        xcur[...] = x_ref[...]

        def read_knot(k):
            return (Ps_ref[pl.ds(k, 1)][0], al_ref[pl.ds(k, 1)][0],
                    xr_ref[pl.ds(k, 1)][0], ur_ref[pl.ds(k, 1)][0],
                    gate_ref[pl.ds(k, 1)][0],
                    tuple(lamS_ref[pl.ds(k, 1)][0,
                                   sc_off[p_]:sc_off[p_ + 1]]
                          for p_ in range(P)))

        def body(k, xc):
            Ps_k, al_k, xr, ur, gate_k, lamS = read_knot(k)
            t = t0_ref[0] + k.astype(jnp.float32) * dt
            state_term, ctrl_term, us_cb = knot_terms(
                t, xc, sc, Ps_k, al_k, xr, ur, gate_k, mu_ref[0], lamS)
            if hoist_k0:
                inc = ctrl_term + state_term
            elif mult_where:
                inc = ctrl_term + state_term * (k > 0).astype(jnp.float32)
            else:
                inc = ctrl_term + jnp.where(k > 0, state_term, 0.0)
            merit_ref[...] = merit_ref[...] + inc
            xcur[...] = integC_lane_t(t, xc, us_cb)
            return 0

        if hoist_k0:
            # Knot 0: ctrl term only (state term gated off at k == 0).
            Ps_k, al_k, xr, ur, gate_k, lamS = read_knot(0)
            t0 = t0_ref[0]
            _, ctrl0, us0 = knot_terms(
                t0, x_ref[...], sc, Ps_k, al_k, xr, ur, gate_k,
                mu_ref[0], lamS)
            merit_ref[...] = ctrl0
            xcur[...] = integC_lane_t(t0, x_ref[...], us0)
            jax.lax.fori_loop(1, N, lambda k, _: body(k, xcur[...]), 0)
        else:
            merit_ref[...] = jnp.zeros_like(merit_ref)
            jax.lax.fori_loop(0, N, lambda k, _: body(k, xcur[...]), 0)
        o_ref[...] = xcur[...]
    return kern


CASES = [
    ("e1_nogate", dict(use_gate=False, hoist_k0=False)),
    ("e2_nowhere", dict(use_gate=True, hoist_k0=True)),
    ("e3_neither", dict(use_gate=False, hoist_k0=True)),
    ("e4_multwhere", dict(use_gate=True, hoist_k0=False,
                          mult_where=True)),
]

for name, kw in CASES:
    kern = make_kernel(**kw)
    cs, rs = run_kernel(
        kern, [x0c, Ps, al, xs_t, us_t, scal, t0v, gate, lamS_op, mu],
        [jax.ShapeDtypeStruct((C, Bb), jnp.float32),
         jax.ShapeDtypeStruct((x, C, Bb), jnp.float32)],
        scratch=[pltpu.VMEM((x, C, Bb), jnp.float32)])
    rec(stage=name, compile_s=round(cs, 1),
        us_per_knot=round(rs / N * 1e6, 2))

rec(stage="done")
