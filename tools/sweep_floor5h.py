"""Bisect INSIDE the polyline closest-point trace (round 4, part h).

sweep_floor5g.txt: one trivial gradient pair through the full pcost
plumbing runs at 0.48 us/knot; adding ONLY the closest-point query makes
it 105.6. This ladder adds the query's constructs one at a time (all
variants: single live cost on player 2, pair (6, expr), same kernel as
floor5g):

  h1_seg_arith   one segment, pure arithmetic projection (no compares)
  h2_clamp_where two compares + nested selects (endpoint clamping)
  h3_abs_eq      + signed-sq-distance + where(cross==0) zero quirk
  h4_two_seg_min two segments + min-scan + exclusive first-win masks
                 (bool & | ~ algebra)
  h6_floatmask   FULL 6-segment lane2 query, bool algebra rewritten as
                 f32 0/1 mask arithmetic (AND=mul, OR=max, NOT=1-m),
                 selects kept as where(mask > 0.5) — candidate fix
  h7_prox        one real proximity AL constraint (bools in mu_eff)

JSON to tools/sweep_floor5h.txt. Run alone on the TPU.
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

from ilqgames_tpu.costs import constraints
from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.costs.base import Cost
from ilqgames_tpu.dynamics import base as dyn_base
from ilqgames_tpu.examples.three_player_intersection import (
    lane_polylines, make_problem)
from ilqgames_tpu.geometry import _static_segments

OUT = "/root/repo/tools/sweep_floor5h.txt"
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
_, lane2, _ = lane_polylines()
_, SEGS = _static_segments(lane2)

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
            return pcost.stage_gradient_sq_tuple(
                pcs_variant, spec, ls, lc, mm, tt, xx, uu)
        inner = jax.vmap(core, in_axes=(0, -1, -1, -1, -1, 0),
                         out_axes=-1)
        outer = jax.vmap(inner, in_axes=(None, 1, 2, None, None, None),
                         out_axes=0)
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
            state_term = s_cb[0] * gate_k[0][None, :]
            for p_ in range(1, P):
                state_term = state_term + s_cb[p_] * gate_k[p_][None, :]
            ctrl_term = r_cb[0]
            for p_ in range(1, P):
                ctrl_term = ctrl_term + r_cb[p_]
            merit_ref[...] = merit_ref[...] + ctrl_term + jnp.where(
                k > 0, state_term, 0.0)
            xcur[...] = integC_lane_t(t, xc, us_cb)
            return 0
        jax.lax.fori_loop(0, N, step, 0)
        o_ref[...] = xcur[...]
    return kern


def one_cost_pcs(cost, constraint=None):
    out = []
    for pi, pc in enumerate(pcs):
        out.append(dataclasses.replace(
            pc,
            state_costs=(cost,) if (pi == 1 and cost is not None) else (),
            state_constraints=(
                (constraint,) if (pi == 1 and constraint is not None)
                else ()),
            control_costs=(), control_constraints=()))
    return tuple(out)


def mk(name, gp):
    return Cost(name, lambda t, v: jnp.zeros(()), None,
                grad_pairs_fn=lambda t, v: gp(v))


(p1, p2, (ux0, uy0), ln0) = SEGS[0]


def gp_h1(v):
    qx, qy = v[6], v[7]
    rx, ry = qx - p1[0], qy - p1[1]
    dot = rx * ux0 + ry * uy0
    cpx = p1[0] + dot * ux0
    return [(6, qx - cpx)]


def gp_h2(v):
    qx, qy = v[6], v[7]
    rx, ry = qx - p1[0], qy - p1[1]
    dot = rx * ux0 + ry * uy0
    behind = dot < 0.0
    ahead = dot > ln0
    cpx = jnp.where(behind, p1[0],
                    jnp.where(ahead, p2[0], p1[0] + dot * ux0))
    return [(6, qx - cpx)]


def gp_h3(v):
    qx, qy = v[6], v[7]
    rx, ry = qx - p1[0], qy - p1[1]
    dot = rx * ux0 + ry * uy0
    cross = rx * uy0 - ux0 * ry
    sq_p1 = rx * rx + ry * ry
    r2x, r2y = qx - p2[0], qy - p2[1]
    sq_p2 = r2x * r2x + r2y * r2y
    behind = dot < 0.0
    ahead = dot > ln0
    cpx = jnp.where(behind, p1[0],
                    jnp.where(ahead, p2[0], p1[0] + dot * ux0))
    abs_raw = jnp.where(behind, sq_p1,
                        jnp.where(ahead, sq_p2, cross * cross))
    abs_ssd = jnp.where(cross == 0.0, 0.0, abs_raw)
    return [(6, qx - cpx + abs_ssd)]


def seg_cand(qx, qy, seg):
    (sp1, sp2, (sux, suy), sln) = seg
    rx, ry = qx - sp1[0], qy - sp1[1]
    dot = rx * sux + ry * suy
    cross = rx * suy - sux * ry
    sq_p1 = rx * rx + ry * ry
    r2x, r2y = qx - sp2[0], qy - sp2[1]
    sq_p2 = r2x * r2x + r2y * r2y
    behind = dot < 0.0
    ahead = dot > sln
    cpx = jnp.where(behind, sp1[0],
                    jnp.where(ahead, sp2[0], sp1[0] + dot * sux))
    abs_raw = jnp.where(behind, sq_p1,
                        jnp.where(ahead, sq_p2, cross * cross))
    abs_ssd = jnp.where(cross == 0.0, 0.0, abs_raw)
    return cpx, abs_ssd


def gp_h4(v):
    qx, qy = v[6], v[7]
    cands = [seg_cand(qx, qy, SEGS[s]) for s in range(2)]
    absd = [jax.lax.stop_gradient(jnp.abs(ssd)) for _, ssd in cands]
    m = jnp.minimum(absd[0], absd[1])
    sel = []
    taken = jnp.zeros_like(m, dtype=bool)
    for a in absd:
        hit = (a <= m) & ~taken
        sel.append(hit)
        taken = taken | hit
    cpx = cands[0][0]
    cpx = jnp.where(sel[1], cands[1][0], cpx)
    return [(6, qx - cpx)]


def gp_h6(v):
    """Full 6-segment lane2 query with f32-mask algebra."""
    qx, qy = v[6], v[7]
    cands = []
    for seg in SEGS:
        (sp1, sp2, (sux, suy), sln) = seg
        rx, ry = qx - sp1[0], qy - sp1[1]
        dot = rx * sux + ry * suy
        cross = rx * suy - sux * ry
        sq_p1 = rx * rx + ry * ry
        r2x, r2y = qx - sp2[0], qy - sp2[1]
        sq_p2 = r2x * r2x + r2y * r2y
        mb_ = jnp.where(dot < 0.0, 1.0, 0.0)
        ma_ = jnp.where(dot > sln, 1.0, 0.0)
        inner = (1.0 - mb_) * (1.0 - ma_)
        cpx = (mb_ * sp1[0] + ma_ * sp2[0]
               + inner * (sp1[0] + dot * sux))
        cpy = (mb_ * sp1[1] + ma_ * sp2[1]
               + inner * (sp1[1] + dot * suy))
        abs_raw = mb_ * sq_p1 + ma_ * sq_p2 + inner * (cross * cross)
        mz = jnp.where(cross == 0.0, 1.0, 0.0)
        abs_ssd = (1.0 - mz) * abs_raw
        is_v = jnp.maximum(mb_, ma_)
        cands.append((cpx, cpy, abs_ssd, is_v))
    m = cands[0][2]
    for c_ in cands[1:]:
        m = jnp.minimum(m, c_[2])
    taken = jnp.zeros_like(m)
    sels = []
    for c_ in cands:
        hit = jnp.where(c_[2] <= m, 1.0, 0.0) * (1.0 - taken)
        sels.append(hit)
        taken = jnp.maximum(taken, hit)
    cpx = sels[0] * cands[0][0]
    dsum = sels[0] * cands[0][2]
    for s in range(1, len(cands)):
        cpx = cpx + sels[s] * cands[s][0]
        dsum = dsum + sels[s] * cands[s][2]
    return [(6, qx - cpx + dsum)]


VARIANTS = [
    ("h1_seg_arith", one_cost_pcs(mk("h1", gp_h1))),
    ("h2_clamp_where", one_cost_pcs(mk("h2", gp_h2))),
    ("h3_abs_eq", one_cost_pcs(mk("h3", gp_h3))),
    ("h4_two_seg_min", one_cost_pcs(mk("h4", gp_h4))),
    ("h6_floatmask", one_cost_pcs(mk("h6", gp_h6))),
    ("h7_prox", one_cost_pcs(
        None, constraints.proximity((6, 7), (12, 13), 6.0,
                                    keep_within=False))),
]

for name, pcs_v in VARIANTS:
    kern = make_merit_kernel(pcs_v)
    cs, rs = run_kernel(
        kern, [x0c, Ps, al, xs_t, us_t, scal, t0v, gate, mu],
        [jax.ShapeDtypeStruct((C, Bb), jnp.float32),
         jax.ShapeDtypeStruct((x, C, Bb), jnp.float32)],
        scratch=[pltpu.VMEM((x, C, Bb), jnp.float32)])
    rec(stage=name, compile_s=round(cs, 1),
        us_per_knot=round(rs / N * 1e6, 2))

rec(stage="done")
