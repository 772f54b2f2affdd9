"""Isolate the ~100 us/knot constant overhead of ANY live merit content.

sweep_floor5b.txt: each cost family ALONE costs ~100+ us/knot in the
merit kernel, while zero-content runs at 0.36 us/knot — so the cost is
a constant triggered by live content, not per-cost math. Variants:

  c1_raw_accum     merit += sum_p xc[idx]^2 directly (no pcost call,
                   no vmap) — is a live accumulate itself the trigger?
  c2_one_nomv      stage_gradient_sq_core, ONE player, ONE quadratic
  c3_scratch_acc   f_nomv accumulating into a VMEM scratch, merit_ref
                   written once at the end — output-ref RMW suspect
  c4_no_gate       f_nomv without the gate multiply
  c5_no_where      f_nomv without the jnp.where(k>0) select
  c6_novmap_nomv   f_nomv content INLINED (no double-vmap): the same
                   math written directly on [C,B] vregs

JSON to tools/sweep_floor5c.txt. Run alone on the TPU.
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
from ilqgames_tpu.examples.three_player_intersection import (
    NOMINAL_V_COST_WEIGHT, make_problem)

OUT = "/root/repo/tools/sweep_floor5c.txt"
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

NOMV_IDX = (4, 10, 15)
NOMV_REF = (8.0, 5.0, 1.5)


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


def make_kernel(body_fn, use_scratch_acc=False):
    """body_fn(k, t, xc, us_cb, gate_k, mu_vec) -> [C, Bb] increment."""
    def kern(x_ref, Ps_ref, al_ref, xr_ref, ur_ref, scal_ref, t0_ref,
             gate_ref, mu_ref, merit_ref, o_ref, xcur, *maybe_acc):
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
            gate_k = gate_ref[pl.ds(k, 1)][0]
            inc = body_fn(k, t, xc, us_cb, gate_k, mu_ref[0])
            acc_ref[...] = acc_ref[...] + inc
            xcur[...] = integC_lane_t(t, xc, us_cb)
            return 0
        jax.lax.fori_loop(0, N, step, 0)
        if use_scratch_acc:
            merit_ref[...] = acc_ref[...]
        o_ref[...] = xcur[...]
    return kern


def nomv_state_term(xc, gate_k, *, use_gate=True):
    terms = []
    for p_, (vi, nv) in enumerate(zip(NOMV_IDX, NOMV_REF)):
        g_ = NOMINAL_V_COST_WEIGHT * (xc[vi] - nv)
        s_ = g_ * g_
        if use_gate:
            s_ = s_ * gate_k[p_][None, :]
        terms.append(s_)
    return terms[0] + terms[1] + terms[2]


# c1: live accumulate straight from the rollout state, no pcost, no vmap
def c1_body(k, t, xc, us_cb, gate_k, mu_v):
    return nomv_state_term(xc, gate_k, use_gate=False)


# c2: ONE player, ONE quadratic via the real pcost core + double-vmap
pcs_one = (
    dataclasses.replace(
        pcs[0], state_costs=tuple(
            c for c in pcs[0].state_costs if "NominalV" in c.name),
        state_constraints=(), control_costs=(), control_constraints=()),
    dataclasses.replace(
        pcs[1], state_costs=(), state_constraints=(), control_costs=(),
        control_constraints=()),
    dataclasses.replace(
        pcs[2], state_costs=(), state_constraints=(), control_costs=(),
        control_constraints=()),
)

pcs_nomv = tuple(
    dataclasses.replace(
        pc, state_costs=tuple(
            c for c in pc.state_costs if "NominalV" in c.name),
        state_constraints=(), control_costs=(), control_constraints=())
    for pc in pcs)


def make_pcost_body(pcs_variant, *, use_gate=True, use_where=True):
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

    def body(k, t, xc, us_cb, gate_k, mu_v):
        lamS = tuple(jnp.zeros((n_sc[p_], Bb), jnp.float32)
                     for p_ in range(P))
        lamC = tuple(jnp.zeros((n_cc[p_], Bb), jnp.float32)
                     for p_ in range(P))
        s_cb, r_cb = grads_cb(t, xc, us_cb, lamS, lamC, mu_v)
        if use_gate:
            state_term = jnp.sum(s_cb * gate_k[:, None, :], axis=0)
        else:
            state_term = jnp.sum(s_cb, axis=0)
        ctrl_term = jnp.sum(r_cb, axis=0)
        if use_where:
            return ctrl_term + jnp.where(k > 0, state_term, 0.0)
        return ctrl_term + state_term
    return body


# c6: the nomv math inlined on [C, B] vregs (no vmap at all)
def c6_body(k, t, xc, us_cb, gate_k, mu_v):
    return nomv_state_term(xc, gate_k, use_gate=True)


CASES = [
    ("c1_raw_accum", make_kernel(c1_body), False),
    ("c2_one_nomv", make_kernel(make_pcost_body(pcs_one)), False),
    ("c3_scratch_acc", make_kernel(make_pcost_body(pcs_nomv),
                                   use_scratch_acc=True), True),
    ("c4_no_gate", make_kernel(make_pcost_body(pcs_nomv, use_gate=False)),
     False),
    ("c5_no_where", make_kernel(make_pcost_body(pcs_nomv, use_where=False)),
     False),
    ("c6_novmap_nomv", make_kernel(c6_body), False),
]

for name, kern, extra_scratch in CASES:
    scratch = [pltpu.VMEM((x, C, Bb), jnp.float32)]
    if extra_scratch:
        scratch.append(pltpu.VMEM((C, Bb), jnp.float32))
    cs, rs = run_kernel(
        kern, [x0c, Ps, al, xs_t, us_t, scal, t0v, gate, mu],
        [jax.ShapeDtypeStruct((C, Bb), jnp.float32),
         jax.ShapeDtypeStruct((x, C, Bb), jnp.float32)],
        scratch=scratch)
    rec(stage=name, compile_s=round(cs, 1),
        us_per_knot=round(rs / N * 1e6, 2))

rec(stage="done")
