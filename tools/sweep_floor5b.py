"""Bisect the sweep kernel's COST CONTENT by family (round 4, part b).

sweep_floor5.txt: the full kernel structure (rollout + control law +
scratch + lane-t + merit machinery with zero cost content) costs
0.36 us/knot; the real flagship cost content (v5_merit_real) costs
135 us/knot. This harness reruns v5 with exactly ONE cost family
populated at a time:

  f_lane   3x quadratic_polyline2 (lane1/3: 1 segment, lane2: 6)
  f_nomv   3x quadratic nominal-speed state cost
  f_ctrl   6x quadratic control costs
  f_prox   6x proximity AL state constraints (real lamS widths)
  f_lane2  ONLY player 2's 6-segment polyline (segment scaling probe)

JSON to tools/sweep_floor5b.txt. Run alone on the TPU.
"""
import dataclasses
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

OUT = "/root/repo/tools/sweep_floor5b.txt"
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


def make_merit_kernel(pcs_variant):
    n_sc = [len(pc.state_constraints) for pc in pcs_variant]
    n_cc = [len(pc.control_constraints) for pc in pcs_variant]

    def grads_cb(t, x_cb, us_cb, lamS, lamC, m):
        def core(tt, xx, uu, ls, lc, mm):
            return pcost.stage_gradient_sq_core(
                pcs_variant, spec, ls, lc, mm, tt, xx, uu)
        inner = jax.vmap(core, in_axes=(0, -1, -1, -1, -1, 0),
                         out_axes=-1)
        outer = jax.vmap(inner, in_axes=(None, 1, 2, None, None, None),
                         out_axes=1)
        return outer(t, x_cb, us_cb, lamS, lamC, m)

    def kern(x_ref, Ps_ref, al_ref, xr_ref, ur_ref, scal_ref, t0_ref,
             gate_ref, mu_ref, merit_ref, o_ref, xcur):
        sc = scal_ref[...]
        xcur[...] = x_ref[...]
        merit_ref[...] = jnp.zeros_like(merit_ref)
        def step(k, _):
            xc = xcur[...]
            P_k = Ps_ref[pl.ds(k, 1)][0]
            a_k = al_ref[pl.ds(k, 1)][0]
            xr = xr_ref[pl.ds(k, 1)][0]
            ur = ur_ref[pl.ds(k, 1)][0]
            t = t0_ref[0] + k.astype(jnp.float32) * dt
            us_flat = feedback_prod(P_k, a_k, ur, sc, xc - xr[:, None, :])
            us_cb = us_flat.reshape(P, u, C, Bb)
            lamS = tuple(jnp.zeros((n_sc[p_], Bb), jnp.float32)
                         for p_ in range(P))
            lamC = tuple(jnp.zeros((n_cc[p_], Bb), jnp.float32)
                         for p_ in range(P))
            s_cb, r_cb = grads_cb(t, xc, us_cb, lamS, lamC, mu_ref[0])
            gate_k = gate_ref[pl.ds(k, 1)][0]
            state_term = jnp.sum(s_cb * gate_k[:, None, :], axis=0)
            ctrl_term = jnp.sum(r_cb, axis=0)
            merit_ref[...] = merit_ref[...] + ctrl_term + jnp.where(
                k > 0, state_term, 0.0)
            xcur[...] = integC_lane_t(t, xc, us_cb)
            return 0
        jax.lax.fori_loop(0, N, step, 0)
        o_ref[...] = xcur[...]
    return kern


def variant(keep):
    out = []
    for pi, pc in enumerate(pcs):
        out.append(dataclasses.replace(
            pc,
            state_costs=tuple(
                c for c in pc.state_costs
                if keep(pi, "state", c.name)),
            state_constraints=tuple(
                c for c in pc.state_constraints
                if keep(pi, "sconstr", c.name)),
            control_costs=tuple(
                (j, c) for (j, c) in pc.control_costs
                if keep(pi, "ctrl", c.name)),
            control_constraints=tuple(
                (j, c) for (j, c) in pc.control_constraints
                if keep(pi, "cconstr", c.name)),
        ))
    return tuple(out)


VARIANTS = {
    "f_lane": variant(lambda pi, kind, nm: kind == "state" and "Lane" in nm),
    "f_nomv": variant(
        lambda pi, kind, nm: kind == "state" and "NominalV" in nm),
    "f_ctrl": variant(lambda pi, kind, nm: kind == "ctrl"),
    "f_prox": variant(lambda pi, kind, nm: kind == "sconstr"),
    "f_lane2": variant(
        lambda pi, kind, nm: pi == 1 and kind == "state" and "Lane" in nm),
}

for name, pcs_v in VARIANTS.items():
    kern = make_merit_kernel(pcs_v)
    cs, rs = run_kernel(
        kern, [x0c, Ps, al, xs_t, us_t, scal, t0v, gate, mu],
        [jax.ShapeDtypeStruct((C, Bb), jnp.float32),
         jax.ShapeDtypeStruct((x, C, Bb), jnp.float32)],
        scratch=[pltpu.VMEM((x, C, Bb), jnp.float32)])
    rec(stage=name, compile_s=round(cs, 1),
        us_per_knot=round(rs / N * 1e6, 2))

rec(stage="done")
