"""Cost model for the emit-rollout + XLA-merit sweep design (part i).

The merit content inside the Mosaic kernel hits an unpredictable
~100 us/knot scheduling cliff (floor5b-h: no stable invariant — a 2-seg
polyline query is 0.49 us/knot, the 6-seg one 105; 1-player quadratics
0.5, 2-player 101). Pivot: Pallas does ONLY the sequential rollout
(proven 0.4-0.9 us/knot) and emits candidate trajectories; the
per-knot gradient merit is computed by plain XLA (embarrassingly
parallel over N x C x B — no Mosaic involved). Pieces measured here:

  i1_emit4d_c1   rollout emitting [N, x, 1, B] / [N, Pu, 1, B] via 4D
                 stores x_c[None] (NO flatten-reshape) at C=1
  i2_emit4d_c8   same at C=8 (the phase-1/deep-round emit)
  i3_emit_flat_c8 current production flatten-emit at C=8 (baseline)
  i4_xla_merit   XLA merit eval of emitted [N, x, C, B] trajectories at
                 B=1024, C=8: vmapped stage_gradient_sq_tuple + exact
                 ascending-k fold (matches the kernel's accumulation
                 order)

JSON to tools/sweep_floor5i.txt. Run alone on the TPU.
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

OUT = "/root/repo/tools/sweep_floor5i.txt"
Bb = 128
N = 100
B = 1024


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

u_mask_flat = np.zeros((Pu,), np.float32)
for i, d in enumerate(spec.udims):
    u_mask_flat[i * u:i * u + d] = 1.0


def integC_lane_t(t, xx, uu):
    one = lambda tt, x_, u_: dyn_base.integrate(dyn, tt, dt, x_, u_)
    inner = jax.vmap(one, in_axes=(0, -1, -1), out_axes=-1)
    return jax.vmap(inner, in_axes=(None, 1, 2), out_axes=1)(t, xx, uu)


def make_emit_kernel(C, flat):
    def kern(x_ref, Ps_ref, al_ref, xr_ref, ur_ref, scal_ref, t0_ref,
             xso_ref, uso_ref, xcur):
        sc = scal_ref[...]
        xcur[...] = jnp.broadcast_to(
            x_ref[...][:, None, :], (x, C, Bb))
        def step(k, _):
            xc = xcur[...]
            P_k = Ps_ref[pl.ds(k, 1)][0]
            a_k = al_ref[pl.ds(k, 1)][0]
            xr = xr_ref[pl.ds(k, 1)][0]
            ur = ur_ref[pl.ds(k, 1)][0]
            t = t0_ref[0] + k.astype(jnp.float32) * dt
            delta = xc - xr[:, None, :]
            rows = []
            for af in range(Pu):
                acc = P_k[af, 0][None, :] * delta[0]
                for xx_ in range(1, x):
                    acc = acc + P_k[af, xx_][None, :] * delta[xx_]
                row = ur[af][None, :] - acc - sc * a_k[af][None, :]
                rows.append(row * float(u_mask_flat[af]))
            us_flat = jnp.stack(rows, 0)
            us_cb = us_flat.reshape(P, u, C, Bb)
            if flat:
                xso_ref[pl.ds(k, 1)] = xc.reshape(1, x * C, Bb)
                uso_ref[pl.ds(k, 1)] = us_flat.reshape(1, Pu * C, Bb)
            else:
                xso_ref[pl.ds(k, 1)] = xc[None]
                uso_ref[pl.ds(k, 1)] = us_flat[None]
            xcur[...] = integC_lane_t(t, xc, us_cb)
            return 0
        jax.lax.fori_loop(0, N, step, 0)
    return kern


def run_emit(name, C, flat):
    x0m = jnp.asarray(rng.randn(x, Bb).astype(np.float32))
    Ps = jnp.asarray(0.01 * rng.randn(N, Pu, x, Bb).astype(np.float32))
    al = jnp.asarray(0.01 * rng.randn(N, Pu, Bb).astype(np.float32))
    xs_t = jnp.asarray(rng.randn(N, x, Bb).astype(np.float32))
    us_t = jnp.asarray(0.01 * rng.randn(N, Pu, Bb).astype(np.float32))
    scal = jnp.asarray(0.5 * np.ones((C, Bb), np.float32))
    t0v = jnp.zeros((1, Bb), jnp.float32)
    if flat:
        out_shape = [jax.ShapeDtypeStruct((N, x * C, Bb), jnp.float32),
                     jax.ShapeDtypeStruct((N, Pu * C, Bb), jnp.float32)]
    else:
        out_shape = [jax.ShapeDtypeStruct((N, x, C, Bb), jnp.float32),
                     jax.ShapeDtypeStruct((N, Pu, C, Bb), jnp.float32)]
    kern = make_emit_kernel(C, flat)
    f = jax.jit(lambda *a: pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(7)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                   for _ in out_shape],
        scratch_shapes=[pltpu.VMEM((x, C, Bb), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*a))
    cs, rs = timeit(f, x0m, Ps, al, xs_t, us_t, scal, t0v)
    rec(stage=name, compile_s=round(cs, 1),
        us_per_knot=round(rs / N * 1e6, 2))


run_emit("i1_emit4d_c1", 1, False)
run_emit("i2_emit4d_c8", 8, False)
run_emit("i3_emit_flat_c8", 8, True)


# ---- i4: XLA merit over emitted trajectories ----
C = 8


def xla_merits(xs_cand, us_cand, t0, lamS_all, mu_v, gate_all):
    """xs_cand [N,x,C,B], us_cand [N,Pu,C,B] -> merits [C,B].
    Same formula and fold order as the kernel: per-knot squared-gradient
    sums, gated, ctrl always + state for k>0, accumulated ascending-k."""
    ts = t0[0][None, :] + jnp.arange(N, dtype=jnp.float32)[:, None] * dt

    def knot(k_args):
        t_b, xk, uk, lamS_k, gate_k = k_args
        lamS = tuple(lamS_k[sc_off[p_]:sc_off[p_ + 1]]
                     for p_ in range(P))
        lamC = tuple(jnp.zeros((n_cc[p_], B), jnp.float32)
                     for p_ in range(P))

        def core(tt, xx, uu, ls, lc, mm):
            return pcost.stage_gradient_sq_tuple(
                pcs, spec, ls, lc, mm, tt, xx, uu)
        inner = jax.vmap(core, in_axes=(0, -1, -1, -1, -1, 0),
                         out_axes=-1)
        outer = jax.vmap(inner, in_axes=(None, 1, 2, None, None, None),
                         out_axes=0)
        s_cb, r_cb = outer(t_b, xk, uk.reshape(P, u, C, -1), lamS, lamC,
                           mu_v)
        state_term = s_cb[0] * gate_k[0][None, :]
        for p_ in range(1, P):
            state_term = state_term + s_cb[p_] * gate_k[p_][None, :]
        ctrl_term = r_cb[0]
        for p_ in range(1, P):
            ctrl_term = ctrl_term + r_cb[p_]
        return state_term, ctrl_term

    def body(carry, k_args):
        k, merit = carry
        state_term, ctrl_term = knot(k_args)
        inc = ctrl_term + jnp.where(k > 0, state_term, 0.0)
        return (k + 1, merit + inc), None

    (_, merits), _ = jax.lax.scan(
        body, (0, jnp.zeros((C, xs_cand.shape[-1]), jnp.float32)),
        (ts, xs_cand, us_cand,
         lamS_all, gate_all))
    return merits


xs_cand = jnp.asarray(rng.randn(N, x, C, B).astype(np.float32))
us_cand = jnp.asarray(0.01 * rng.randn(N, Pu, C, B).astype(np.float32))
t0v = jnp.zeros((1, B), jnp.float32)
lamS_all = jnp.asarray(0.1 * rng.rand(N, nS, B).astype(np.float32))
mu_v = 10.0 * jnp.ones((B,), jnp.float32)
gate_all = jnp.ones((N, P, B), jnp.float32)

f = jax.jit(xla_merits)
cs, rs = timeit(f, xs_cand, us_cand, t0v, lamS_all, mu_v, gate_all)
rec(stage="i4_xla_merit", compile_s=round(cs, 1),
    per_call_ms=round(rs * 1e3, 2),
    us_per_knot_block=round(rs / N / (B // Bb) * 1e6, 2))

rec(stage="done")
