"""Pin the fresh-buffer consumption overhead (part h).

kernel_profile6g.txt: merit on FIXED param arrays = 1.4 ms; the same
merit consuming freshly produced 9 MB buffers (pallas OR chained jit)
= 10.3 ms. Cases:

  z1_xla_chain    jitA (x*1.0000001, fresh 9MB outputs) -> jitB merit
  z2_cycle_bufs   merit jit cycling through 8 pre-made input sets
  z3_fixed_bufs   merit jit on one fixed input set (control)
  z4_emit_sumjit  emit jit -> separate sum jit (trivial consumer)
  z5_handoff_mb   producer->consumer handoff bandwidth: jitA makes a
                  fresh [M] f32 array, jitB sums it; M = 1, 8, 64 MB

JSON to tools/kernel_profile6h.txt. Run alone on the TPU.
"""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas.sweep import _run, _xla_merits

OUT = "/root/repo/tools/kernel_profile6h.txt"
def rec(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f: f.write(line + "\n")

def timeit(fn, *args, reps=20):
    t0 = time.perf_counter()
    out = fn(*args); jax.block_until_ready(out)
    cs = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    jax.block_until_ready(out)
    return cs, (time.perf_counter() - t0) / reps

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

f_merit = jax.jit(lambda xc, uc, t0, ls, m_, g: _xla_merits(
    pcs, spec, xc, uc, t0, ls, None, m_, g))

mk_x = lambda: jnp.asarray(rng.randn(N, x, C, Bb).astype(np.float32))
mk_u = lambda: jnp.asarray(0.01*rng.randn(N, Pu, C, Bb).astype(np.float32))

xc0, uc0 = mk_x(), mk_u()
f_prod = jax.jit(lambda a, b: (a * 1.0000001, b * 1.0000001))

def z1(a, b):
    xc, uc = f_prod(a, b)
    return f_merit(xc, uc, t0v, lamS, mu, gate)

cs, rs = timeit(z1, xc0, uc0)
rec(stage="z1_xla_chain", compile_s=round(cs,1), per_call_ms=round(rs*1e3,3))

bufs = [(mk_x(), mk_u()) for _ in range(8)]
jax.block_until_ready(bufs)
i_ = [0]
def z2():
    a, b = bufs[i_[0] % 8]; i_[0] += 1
    return f_merit(a, b, t0v, lamS, mu, gate)
cs, rs = timeit(z2, reps=24)
rec(stage="z2_cycle_bufs", per_call_ms=round(rs*1e3,3))

cs, rs = timeit(lambda: f_merit(xc0, uc0, t0v, lamS, mu, gate), reps=20)
rec(stage="z3_fixed_bufs", per_call_ms=round(rs*1e3,3))

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

def z4(x0m_, op_, st_, scal_):
    xc, uc = f_emit(x0m_, op_, st_, scal_)
    return f_sum(xc, uc)
cs, rs = timeit(z4, x0m, op, st, scal)
rec(stage="z4_emit_sumjit", compile_s=round(cs,1), per_call_ms=round(rs*1e3,3))

for mb in (1, 8, 64):
    n = mb * 262144
    a0 = jnp.ones((n,), jnp.float32)
    fa = jax.jit(lambda a: a * 1.0000001)
    fs = jax.jit(lambda a: a.sum())
    def hop(a):
        return fs(fa(a))
    cs, rs = timeit(hop, a0)
    rec(stage=f"z5_handoff_{mb}mb", per_call_ms=round(rs*1e3,3),
        gbps=round(mb/1024.0/(rs), 2))
rec(stage="done")
