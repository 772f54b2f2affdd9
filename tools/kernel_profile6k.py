"""Final tax-structure probes (part k).

  k1_keepalive  chain but ALL outputs kept alive (no frees) — allocator
                churn test
  k2_copy_mid   emit -> copy-jit (a+0.0) -> merit (producer identity)
  k3_c2_chain   chain at C=2 (quarter the bytes) — flat vs per-byte

JSON to tools/kernel_profile6k.txt. Run alone on the TPU.
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

OUT = "/root/repo/tools/kernel_profile6k.txt"
def rec(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f: f.write(line + "\n")

Bb = 128
problem = make_problem()
dyn, spec, pcs = problem.dynamics, problem.spec, problem.player_costs
N, x, P, u = spec.num_time_steps, spec.xdim, spec.num_players, spec.umax
Pu = P * u
rng = np.random.RandomState(0)
n_sc = [len(pc.state_constraints) for pc in pcs]
nS = sum(n_sc)

def operands(Cc):
    op = {"xs": jnp.asarray(rng.randn(N, x, Bb).astype(np.float32)),
          "us": jnp.asarray(0.01*rng.randn(N, Pu, Bb).astype(np.float32)),
          "t0": jnp.zeros((1, Bb), jnp.float32)}
    st = {"Ps": jnp.asarray(0.01*rng.randn(N, Pu, x, Bb).astype(np.float32)),
          "alphas": jnp.asarray(0.01*rng.randn(N, Pu, Bb).astype(np.float32))}
    x0m = jnp.asarray(rng.randn(x, Bb).astype(np.float32))
    lamS = jnp.asarray(0.1*rng.rand(N, nS, Bb).astype(np.float32))
    mu = 10.0*jnp.ones((1, Bb), jnp.float32)
    gate = jnp.ones((N, P, Bb), jnp.float32)
    scal = jnp.broadcast_to(jnp.asarray(
        0.1*0.5**np.arange(Cc, dtype=np.float32))[:, None], (Cc, Bb))
    return op, st, x0m, lamS, mu, gate, scal

def make(Cc):
    f_emit = jax.jit(lambda x0m_, op_, st_, scal_: _run(
        dyn, None, spec, x0m_, op_, st_, scal_, None, None, None, None,
        compute_merit=False, emit_traj=True, batch_block=Bb,
        interpret=False))
    f_merit = jax.jit(lambda xc, uc, t0, ls, m_, g: _xla_merits(
        pcs, spec, xc, uc, t0, ls, None, m_, g))
    return f_emit, f_merit

f_emit, f_merit = make(8)
op, st, x0m, lamS, mu, gate, scal = operands(8)

keep = []
def k1():
    xc, uc = f_emit(x0m, op, st, scal)
    m = f_merit(xc, uc, op["t0"], lamS, mu, gate)
    keep.append((xc, uc, m))
    return m
m = k1(); jax.block_until_ready(m); keep.clear()
t0 = time.perf_counter()
outs = [k1() for _ in range(20)]
jax.block_until_ready(outs)
rec(stage="k1_keepalive", per_call_ms=round((time.perf_counter()-t0)/20*1e3,3))
keep.clear()

f_copy = jax.jit(lambda a, b: (a + 0.0, b + 0.0))
def k2():
    xc, uc = f_emit(x0m, op, st, scal)
    xc, uc = f_copy(xc, uc)
    return f_merit(xc, uc, op["t0"], lamS, mu, gate)
m = k2(); jax.block_until_ready(m)
t0 = time.perf_counter()
for _ in range(20): m = k2()
jax.block_until_ready(m)
rec(stage="k2_copy_mid", per_call_ms=round((time.perf_counter()-t0)/20*1e3,3))

f_emit2, f_merit2 = make(2)
op2, st2, x0m2, lamS2, mu2, gate2, scal2 = operands(2)
def k3():
    xc, uc = f_emit2(x0m2, op2, st2, scal2)
    return f_merit2(xc, uc, op2["t0"], lamS2, mu2, gate2)
m = k3(); jax.block_until_ready(m)
t0 = time.perf_counter()
for _ in range(20): m = k3()
jax.block_until_ready(m)
rec(stage="k3_c2_chain", per_call_ms=round((time.perf_counter()-t0)/20*1e3,3))
rec(stage="done")
