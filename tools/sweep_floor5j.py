"""Confirm the two in-kernel merit fixes before landing them (part j).

Pre-kill facts: ONE live player per merit kernel is always fast
(g1/h*), >=2 live players is slow (g5/g6) even for pure quadratics;
the 6-segment BOOL-algebra polyline query is slow even single-player
(g2), while the float-mask variant is fast (h6). Candidate production
design: float-mask geometry (select semantics preserved — bitwise
identical values) + one merit kernel call per player. Cases:

  p1_fm_select   one-player 6-seg lane cost, float-mask masks with
                 jnp.where(mask > 0.5) data selects (inf-safe form)
  p2_perplayer   FULL flagship content as 3 calls (one live player
                 each, fm geometry); reports the 3-call total
  p3_onecall_fm  full content, one call, fm geometry (is the
                 multi-player trigger gone once geometry is fm?)

JSON to tools/sweep_floor5j.txt. Run alone on the TPU.
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

from ilqgames_tpu import geometry
from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.dynamics import base as dyn_base

OUT = "/root/repo/tools/sweep_floor5j.txt"
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
    return f, timeit(f, *operands)


# ---- float-mask closest-point (select-preserving, candidate port) ----
def fm_closest_point_xy(points, qx, qy):
    """polyline_closest_point_xy(need_sign=False) with ALL boolean
    algebra replaced by f32 0/1 mask arithmetic (AND=mul, OR=max,
    NOT=1-m); every DATA select stays a jnp.where on (mask > 0.5), so
    selected values are bitwise identical to the bool version
    (including inf/nan lanes)."""
    pts, segs = geometry._static_segments(points)
    S = len(segs)

    cand = []
    for s, (p1, p2, (ux, uy), length) in enumerate(segs):
        rx, ry = qx - p1[0], qy - p1[1]
        dot = rx * ux + ry * uy
        cross = rx * uy - ux * ry
        sq_p1 = rx * rx + ry * ry
        r2x, r2y = qx - p2[0], qy - p2[1]
        sq_p2 = r2x * r2x + r2y * r2y

        m_behind = jnp.where(dot < 0.0, 1.0, 0.0)
        m_ahead = jnp.where(dot > length, 1.0, 0.0)
        m_vertex = jnp.maximum(m_behind, m_ahead)

        cpx = jnp.where(m_behind > 0.5, p1[0],
                        jnp.where(m_ahead > 0.5, p2[0], p1[0] + dot * ux))
        cpy = jnp.where(m_behind > 0.5, p1[1],
                        jnp.where(m_ahead > 0.5, p2[1], p1[1] + dot * uy))
        abs_raw = jnp.where(m_behind > 0.5, sq_p1,
                            jnp.where(m_ahead > 0.5, sq_p2, cross * cross))
        abs_ssd = jnp.where(cross == 0.0, 0.0, abs_raw)
        cand.append(dict(cpx=cpx, cpy=cpy, ssd=abs_ssd,
                         m_vertex=m_vertex, p1=p1, unit=(ux, uy)))

    absd = [jax.lax.stop_gradient(jnp.abs(c["ssd"])) for c in cand]
    m = absd[0]
    for a in absd[1:]:
        m = jnp.minimum(m, a)
    sels = []
    taken = jnp.zeros_like(m)
    for a in absd:
        hit = jnp.where(a <= m, 1.0, 0.0) * (1.0 - taken)
        sels.append(hit)
        taken = jnp.maximum(taken, hit)

    def pick(vals):
        acc = vals[0]
        for s in range(1, S):
            acc = jnp.where(sels[s] > 0.5, vals[s], acc)
        return acc

    cpx = pick([c["cpx"] for c in cand])
    cpy = pick([c["cpy"] for c in cand])
    ssd = pick([c["ssd"] for c in cand])
    m_vertex = pick([c["m_vertex"] for c in cand])
    p1x = pick([jnp.full_like(qx, c["p1"][0]) for c in cand])
    p1y = pick([jnp.full_like(qx, c["p1"][1]) for c in cand])
    unx = pick([jnp.full_like(qx, c["unit"][0]) for c in cand])
    uny = pick([jnp.full_like(qx, c["unit"][1]) for c in cand])

    from ilqgames_tpu.types import SMALL_NUMBER
    fx, fy = float(pts[0][0]), float(pts[0][1])
    lx, ly = float(pts[-1][0]), float(pts[-1][1])
    d_first = (cpx - fx) ** 2 + (cpy - fy) ** 2
    d_last = (cpx - lx) ** 2 + (cpy - ly) ** 2
    m_endpoint = jnp.maximum(jnp.where(d_first < SMALL_NUMBER, 1.0, 0.0),
                             jnp.where(d_last < SMALL_NUMBER, 1.0, 0.0))
    return geometry.ClosestPointXY(
        cpx=cpx, cpy=cpy, signed_sq_distance=ssd,
        is_vertex=m_vertex > 0.5, is_endpoint=m_endpoint > 0.5,
        p1x=p1x, p1y=p1y, ux=unx, uy=uny)


# Monkeypatch BOTH modes through the sign-free fm query for this probe
# (the flagship only uses need_sign=False).
_orig = geometry.polyline_closest_point_xy
geometry.polyline_closest_point_xy = (
    lambda pts, qx, qy, need_sign=True: fm_closest_point_xy(pts, qx, qy))

from ilqgames_tpu.examples.three_player_intersection import make_problem

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
n_sc_full = [len(pc.state_constraints) for pc in pcs]
nS = sum(n_sc_full)
sc_off = np.cumsum([0] + n_sc_full)
lamS_op = jnp.asarray(0.1 * rng.rand(N, nS, Bb).astype(np.float32))

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


def make_merit_kernel(pcs_variant, with_lamS):
    n_sc = [len(pc.state_constraints) for pc in pcs_variant]
    n_cc = [len(pc.control_constraints) for pc in pcs_variant]

    def grads_cb(t, x_cb, us_cb, lamS, lamC, m):
        def core(tt, xx, uu, ls, lc, mm):
            return pcost.stage_gradient_sq_tuple(
                pcs_variant, spec, ls, lc, mm, tt, xx, uu)
        inner = jax.vmap(core, in_axes=(0, -1, -1, -1, -1, 0),
                         out_axes=-1)
        outer = jax.vmap(inner, in_axes=(None, 1, 2, None, None, None),
                         out_axes=0)
        return outer(t, x_cb, us_cb, lamS, lamC, m)

    def kern(*refs):
        it = iter(refs)
        x_ref = next(it); Ps_ref = next(it); al_ref = next(it)
        xr_ref = next(it); ur_ref = next(it); scal_ref = next(it)
        t0_ref = next(it); gate_ref = next(it)
        lamS_ref = next(it) if with_lamS else None
        mu_ref = next(it)
        merit_ref = next(it); o_ref = next(it); xcur = next(it)
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
            if with_lamS:
                lamS = tuple(
                    lamS_ref[pl.ds(k, 1)][0, sc_off[p_]:sc_off[p_ + 1]]
                    if n_sc[p_] > 0 else
                    jnp.zeros((0, Bb), jnp.float32)
                    for p_ in range(P))
            else:
                lamS = tuple(jnp.zeros((n_sc[p_], Bb), jnp.float32)
                             for p_ in range(P))
            lamC = tuple(jnp.zeros((n_cc[p_], Bb), jnp.float32)
                         for p_ in range(P))
            s_cb, r_cb = grads_cb(t, xc, us_cb, lamS, lamC, mu_ref[0])
            gate_k = gate_ref[pl.ds(k, 1)][0]
            state_term = s_cb[0] * gate_k[0][None, :]
            ctrl_term = r_cb[0]
            for p_ in range(1, P):
                state_term = state_term + s_cb[p_] * gate_k[p_][None, :]
                ctrl_term = ctrl_term + r_cb[p_]
            merit_ref[...] = merit_ref[...] + ctrl_term + jnp.where(
                k > 0, state_term, 0.0)
            xcur[...] = integC_lane_t(t, xc, us_cb)
            return 0
        jax.lax.fori_loop(0, N, step, 0)
        o_ref[...] = xcur[...]
    return kern


def strip_to_player(pi_keep):
    out = []
    for pi, pc in enumerate(pcs):
        if pi == pi_keep:
            out.append(pc)
        else:
            out.append(dataclasses.replace(
                pc, state_costs=(), state_constraints=(),
                control_costs=(), control_constraints=()))
    return tuple(out)


# p1: one-player lane cost only (fm geometry via the monkeypatch)
p1 = tuple(dataclasses.replace(
    pc,
    state_costs=tuple(c for c in pc.state_costs
                      if pi == 1 and "Lane" in c.name),
    state_constraints=(), control_costs=(), control_constraints=())
    for pi, pc in enumerate(pcs))
kern = make_merit_kernel(p1, with_lamS=False)
_, (cs, rs) = run_kernel(
    kern, [x0c, Ps, al, xs_t, us_t, scal, t0v, gate, mu],
    [jax.ShapeDtypeStruct((C, Bb), jnp.float32),
     jax.ShapeDtypeStruct((x, C, Bb), jnp.float32)],
    scratch=[pltpu.VMEM((x, C, Bb), jnp.float32)])
rec(stage="p1_fm_select", compile_s=round(cs, 1),
    us_per_knot=round(rs / N * 1e6, 2))

# p2: full content, 3 per-player calls
fs = []
for pi in range(P):
    kern = make_merit_kernel(strip_to_player(pi), with_lamS=True)
    f, (cs, rs) = run_kernel(
        kern, [x0c, Ps, al, xs_t, us_t, scal, t0v, gate, lamS_op, mu],
        [jax.ShapeDtypeStruct((C, Bb), jnp.float32),
         jax.ShapeDtypeStruct((x, C, Bb), jnp.float32)],
        scratch=[pltpu.VMEM((x, C, Bb), jnp.float32)])
    rec(stage=f"p2_player{pi}", compile_s=round(cs, 1),
        us_per_knot=round(rs / N * 1e6, 2))
    fs.append(f)

def all3(*a):
    outs = [f(*a) for f in fs]
    return outs
t0 = time.perf_counter()
for _ in range(20):
    outs = all3(x0c, Ps, al, xs_t, us_t, scal, t0v, gate, lamS_op, mu)
jax.block_until_ready(outs)
rec(stage="p2_perplayer_total",
    per_call_ms=round((time.perf_counter() - t0) / 20 * 1e3, 3))

# p3: full content, one call, fm geometry
kern = make_merit_kernel(pcs, with_lamS=True)
_, (cs, rs) = run_kernel(
    kern, [x0c, Ps, al, xs_t, us_t, scal, t0v, gate, lamS_op, mu],
    [jax.ShapeDtypeStruct((C, Bb), jnp.float32),
     jax.ShapeDtypeStruct((x, C, Bb), jnp.float32)],
    scratch=[pltpu.VMEM((x, C, Bb), jnp.float32)])
rec(stage="p3_onecall_fm", compile_s=round(cs, 1),
    us_per_knot=round(rs / N * 1e6, 2))

rec(stage="done")
