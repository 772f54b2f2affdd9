"""Confirm the scratch-accumulation fix at FULL flagship cost content,
and probe the emit_traj path for the same output-ref cliff.

sweep_floor5c.txt isolated the sweep kernel's ~100 us/knot overhead to
the per-knot read-modify-write of the OUTPUT ref (merit_ref += inc):
identical math accumulated in a VMEM scratch ref runs at 0.67 us/knot.
Variants here:

  d1_full_scratch   full flagship content (lane+nomv+ctrl+prox, real
                    lamS widths), scratch accumulation — the production
                    fix candidate
  d2_full_output    same content, output-ref RMW (production today)
  d3_emit_direct    C=1 rollout emitting xs/us per knot into output
                    refs (production reroll pattern)
  d4_emit_scratch   same, buffered in scratch, one copy at the end

JSON to tools/sweep_floor5d.txt. Run alone on the TPU.
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

OUT = "/root/repo/tools/sweep_floor5d.txt"
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
x0c1 = jnp.asarray(rng.randn(x, 1, Bb).astype(np.float32))
Ps = jnp.asarray(0.01 * rng.randn(N, Pu, x, Bb).astype(np.float32))
al = jnp.asarray(0.01 * rng.randn(N, Pu, Bb).astype(np.float32))
xs_t = jnp.asarray(rng.randn(N, x, Bb).astype(np.float32))
us_t = jnp.asarray(0.01 * rng.randn(N, Pu, Bb).astype(np.float32))
scal = jnp.asarray(0.5 * np.ones((C, Bb), np.float32))
scal1 = jnp.asarray(0.5 * np.ones((1, Bb), np.float32))
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


def integC_lane_t(t, xx, uu, Cc):
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


def make_full_kernel(use_scratch_acc):
    def kern(x_ref, Ps_ref, al_ref, xr_ref, ur_ref, scal_ref, t0_ref,
             gate_ref, lamS_ref, mu_ref, merit_ref, o_ref, xcur,
             *maybe_acc):
        sc = scal_ref[...]
        xcur[...] = x_ref[...]
        acc_ref = maybe_acc[0] if use_scratch_acc else merit_ref
        acc_ref[...] = jnp.zeros_like(acc_ref)
        def step(k, _):
            xc = xcur[...]
            P_k = Ps_ref[pl.ds(k, 1)][0]
            a_k = al_ref[pl.ds(k, 1)][0]
            xr = xr_ref[pl.ds(k, 1)][0]
            ur = ur_ref[pl.ds(k, 1)][0]
            t = t0_ref[0] + k.astype(jnp.float32) * dt
            us_flat = feedback_prod(P_k, a_k, ur, sc, xc - xr[:, None, :])
            us_cb = us_flat.reshape(P, u, C, Bb)
            lamS = tuple(
                lamS_ref[pl.ds(k, 1)][0, sc_off[p_]:sc_off[p_ + 1]]
                for p_ in range(P))
            lamC = tuple(jnp.zeros((n_cc[p_], Bb), jnp.float32)
                         for p_ in range(P))
            s_cb, r_cb = grads_cb(t, xc, us_cb, lamS, lamC, mu_ref[0])
            gate_k = gate_ref[pl.ds(k, 1)][0]
            state_term = jnp.sum(s_cb * gate_k[:, None, :], axis=0)
            ctrl_term = jnp.sum(r_cb, axis=0)
            acc_ref[...] = acc_ref[...] + ctrl_term + jnp.where(
                k > 0, state_term, 0.0)
            xcur[...] = integC_lane_t(t, xc, us_cb, C)
            return 0
        jax.lax.fori_loop(0, N, step, 0)
        if use_scratch_acc:
            merit_ref[...] = acc_ref[...]
        o_ref[...] = xcur[...]
    return kern


for name, use_scratch in (("d1_full_scratch", True),
                          ("d2_full_output", False)):
    kern = make_full_kernel(use_scratch)
    scratch = [pltpu.VMEM((x, C, Bb), jnp.float32)]
    if use_scratch:
        scratch.append(pltpu.VMEM((C, Bb), jnp.float32))
    cs, rs = run_kernel(
        kern, [x0c, Ps, al, xs_t, us_t, scal, t0v, gate, lamS_op, mu],
        [jax.ShapeDtypeStruct((C, Bb), jnp.float32),
         jax.ShapeDtypeStruct((x, C, Bb), jnp.float32)],
        scratch=scratch)
    rec(stage=name, compile_s=round(cs, 1),
        us_per_knot=round(rs / N * 1e6, 2))


def make_emit_kernel(use_scratch_buf):
    C1 = 1
    def kern(x_ref, Ps_ref, al_ref, xr_ref, ur_ref, scal_ref, t0_ref,
             xso_ref, uso_ref, xcur, *maybe_buf):
        sc = scal_ref[...]
        xcur[...] = x_ref[...]
        xbuf = maybe_buf[0] if use_scratch_buf else xso_ref
        ubuf = maybe_buf[1] if use_scratch_buf else uso_ref
        def step(k, _):
            xc = xcur[...]
            P_k = Ps_ref[pl.ds(k, 1)][0]
            a_k = al_ref[pl.ds(k, 1)][0]
            xr = xr_ref[pl.ds(k, 1)][0]
            ur = ur_ref[pl.ds(k, 1)][0]
            t = t0_ref[0] + k.astype(jnp.float32) * dt
            us_flat = feedback_prod(P_k, a_k, ur, sc, xc - xr[:, None, :])
            us_cb = us_flat.reshape(P, u, C1, Bb)
            xbuf[pl.ds(k, 1)] = xc.reshape(1, x * C1, Bb)
            ubuf[pl.ds(k, 1)] = us_flat.reshape(1, Pu * C1, Bb)
            xcur[...] = integC_lane_t(t, xc, us_cb, C1)
            return 0
        jax.lax.fori_loop(0, N, step, 0)
        if use_scratch_buf:
            xso_ref[...] = xbuf[...]
            uso_ref[...] = ubuf[...]
    return kern


for name, use_buf in (("d3_emit_direct", False), ("d4_emit_scratch", True)):
    kern = make_emit_kernel(use_buf)
    scratch = [pltpu.VMEM((x, 1, Bb), jnp.float32)]
    if use_buf:
        scratch.append(pltpu.VMEM((N, x, Bb), jnp.float32))
        scratch.append(pltpu.VMEM((N, Pu, Bb), jnp.float32))
    cs, rs = run_kernel(
        kern, [x0c1, Ps, al, xs_t, us_t, scal1, t0v],
        [jax.ShapeDtypeStruct((N, x, Bb), jnp.float32),
         jax.ShapeDtypeStruct((N, Pu, Bb), jnp.float32)],
        scratch=scratch)
    rec(stage=name, compile_s=round(cs, 1),
        us_per_knot=round(rs / N * 1e6, 2))

rec(stage="done")
