"""Flat ~10 ms/call tax: host-side (enqueue) or device-side? (part i2)

Every slow case in floor5/profile6 clusters at 10-13.5 ms/call flat.
For each case, measure (1) enqueue time for 20 queued calls WITHOUT
blocking, (2) total time including block_until_ready:

  t1_merit_fixed   fast control (XLA merit, fixed inputs)
  t2_chain         emit-jit -> sum-jit (slow case)
  t3_slow_kernel   in-kernel merit, 3-player nomv content (slow case)
  t4_emit_only     pallas emit alone (fast control)

JSON to tools/kernel_profile6i.txt. Run alone on the TPU.
"""
import sys, time, json, dataclasses
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas.sweep import _run, _xla_merits
from ilqgames_tpu.dynamics import base as dyn_base

OUT = "/root/repo/tools/kernel_profile6i.txt"
def rec(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f: f.write(line + "\n")

def split_time(fn, reps=20):
    out = fn(); jax.block_until_ready(out)   # warm
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    enq = time.perf_counter() - t0
    jax.block_until_ready(outs)
    tot = time.perf_counter() - t0
    return enq / reps, tot / reps

Bb, C = 128, 8
problem = make_problem()
dyn, spec, pcs = problem.dynamics, problem.spec, problem.player_costs
N, x, P, u = spec.num_time_steps, spec.xdim, spec.num_players, spec.umax
Pu = P * u
rng = np.random.RandomState(0)
n_sc = [len(pc.state_constraints) for pc in pcs]
nS = sum(n_sc)
t0v = jnp.zeros((1, Bb), jnp.float32)
lamS = jnp.asarray(0.1*rng.rand(N, nS, Bb).astype(np.float32))
mu = 10.0*jnp.ones((1, Bb), jnp.float32)
gate = jnp.ones((N, P, Bb), jnp.float32)
xc0 = jnp.asarray(rng.randn(N, x, C, Bb).astype(np.float32))
uc0 = jnp.asarray(0.01*rng.randn(N, Pu, C, Bb).astype(np.float32))

f_merit = jax.jit(lambda xc, uc, t0, ls, m_, g: _xla_merits(
    pcs, spec, xc, uc, t0, ls, None, m_, g))
enq, tot = split_time(lambda: f_merit(xc0, uc0, t0v, lamS, mu, gate))
rec(stage="t1_merit_fixed", enq_ms=round(enq*1e3,3), tot_ms=round(tot*1e3,3))

op = {"xs": jnp.asarray(rng.randn(N, x, Bb).astype(np.float32)),
      "us": jnp.asarray(0.01*rng.randn(N, Pu, Bb).astype(np.float32)),
      "t0": t0v}
st = {"Ps": jnp.asarray(0.01*rng.randn(N, Pu, x, Bb).astype(np.float32)),
      "alphas": jnp.asarray(0.01*rng.randn(N, Pu, Bb).astype(np.float32))}
x0m = jnp.asarray(rng.randn(x, Bb).astype(np.float32))
scal = jnp.broadcast_to(jnp.asarray(0.1*0.5**np.arange(C, dtype=np.float32))[:, None], (C, Bb))
f_emit = jax.jit(lambda x0m_, op_, st_, scal_: _run(
    dyn, None, spec, x0m_, op_, st_, scal_, None, None, None, None,
    compute_merit=False, emit_traj=True, batch_block=Bb, interpret=False))
f_sum = jax.jit(lambda a, b: a.sum() + b.sum())
def chain():
    xc, uc = f_emit(x0m, op, st, scal)
    return f_sum(xc, uc)
enq, tot = split_time(chain)
rec(stage="t2_chain", enq_ms=round(enq*1e3,3), tot_ms=round(tot*1e3,3))

# t3: in-kernel merit with 3-player nomv content (known slow: ~10 ms)
pcs_nomv = tuple(dataclasses.replace(
    pc, state_costs=tuple(c for c in pc.state_costs if "NominalV" in c.name),
    state_constraints=(), control_costs=(), control_constraints=())
    for pc in pcs)
u_mask_flat = np.zeros((Pu,), np.float32)
for i, d in enumerate(spec.udims):
    u_mask_flat[i*u:i*u+d] = 1.0
dt = spec.dt

def integC(t, xx, uu):
    one = lambda tt, x_, u_: dyn_base.integrate(dyn, tt, dt, x_, u_)
    inner = jax.vmap(one, in_axes=(0, -1, -1), out_axes=-1)
    return jax.vmap(inner, in_axes=(None, 1, 2), out_axes=1)(t, xx, uu)

def kern(x_ref, Ps_ref, al_ref, xr_ref, ur_ref, scal_ref, t0_ref,
         gate_ref, mu_ref, merit_ref, o_ref, xcur):
    sc = scal_ref[...]
    xcur[...] = x_ref[...]
    merit_ref[...] = jnp.zeros_like(merit_ref)
    def grads_cb(t, x_cb, us_cb, ls, lc, m):
        def core(tt, xx, uu, l1, l2, mm):
            return pcost.stage_gradient_sq_tuple(pcs_nomv, spec, l1, l2, mm, tt, xx, uu)
        inner = jax.vmap(core, in_axes=(0, -1, -1, -1, -1, 0), out_axes=-1)
        outer = jax.vmap(inner, in_axes=(None, 1, 2, None, None, None), out_axes=0)
        return outer(t, x_cb, us_cb, ls, lc, m)
    def step(k, _):
        xcv = xcur[...]
        P_k = Ps_ref[pl.ds(k, 1)][0]
        a_k = al_ref[pl.ds(k, 1)][0]
        xr = xr_ref[pl.ds(k, 1)][0]
        ur = ur_ref[pl.ds(k, 1)][0]
        t = t0_ref[0] + k.astype(jnp.float32) * dt
        delta = xcv - xr[:, None, :]
        rows = []
        for af in range(Pu):
            acc = P_k[af, 0][None, :] * delta[0]
            for xx_ in range(1, x):
                acc = acc + P_k[af, xx_][None, :] * delta[xx_]
            rows.append((ur[af][None, :] - acc - sc * a_k[af][None, :])
                        * float(u_mask_flat[af]))
        us_flat = jnp.stack(rows, 0)
        us_cb = us_flat.reshape(P, u, C, Bb)
        ls = tuple(jnp.zeros((0, Bb), jnp.float32) for _ in range(P))
        lc = tuple(jnp.zeros((0, Bb), jnp.float32) for _ in range(P))
        s_cb, r_cb = grads_cb(t, xcv, us_cb, ls, lc, mu_ref[0])
        gate_k = gate_ref[pl.ds(k, 1)][0]
        state = s_cb[0]*gate_k[0][None,:]
        ctrl = r_cb[0]
        for p_ in range(1, P):
            state = state + s_cb[p_]*gate_k[p_][None,:]
            ctrl = ctrl + r_cb[p_]
        merit_ref[...] = merit_ref[...] + ctrl + jnp.where(k > 0, state, 0.0)
        xcur[...] = integC(t, xcv, us_cb)
        return 0
    jax.lax.fori_loop(0, N, step, 0)
    o_ref[...] = xcur[...]

x0c = jnp.asarray(rng.randn(x, C, Bb).astype(np.float32))
f_slow = jax.jit(lambda *a: pl.pallas_call(
    kern,
    out_shape=[jax.ShapeDtypeStruct((C, Bb), jnp.float32),
               jax.ShapeDtypeStruct((x, C, Bb), jnp.float32)],
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(9)],
    out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2)],
    scratch_shapes=[pltpu.VMEM((x, C, Bb), jnp.float32)],
    compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
)(*a))
enq, tot = split_time(lambda: f_slow(
    x0c, st["Ps"], st["alphas"], op["xs"], op["us"], scal, t0v, gate, mu))
rec(stage="t3_slow_kernel", enq_ms=round(enq*1e3,3), tot_ms=round(tot*1e3,3))

enq, tot = split_time(lambda: f_emit(x0m, op, st, scal))
rec(stage="t4_emit_only", enq_ms=round(enq*1e3,3), tot_ms=round(tot*1e3,3))
rec(stage="done")
