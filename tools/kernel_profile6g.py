"""Last composition probes: output-escape trick + two-dispatch chain.

  y1_escape     one jit returning (merits, xs_cand, us_cand) — escaping
                buffers get entry-layout/HBM; does the merit run fast?
  y2_chain      two jits: emit-jit then merit-jit, queued back-to-back
  y3_chain_full same at B=1024 (8 blocks)

JSON to tools/kernel_profile6g.txt. Run alone on the TPU.
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

OUT = "/root/repo/tools/kernel_profile6g.txt"
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

def operands(Bn):
    op = {"xs": jnp.asarray(rng.randn(N, x, Bn).astype(np.float32)),
          "us": jnp.asarray(0.01*rng.randn(N, Pu, Bn).astype(np.float32)),
          "t0": jnp.zeros((1, Bn), jnp.float32)}
    st = {"Ps": jnp.asarray(0.01*rng.randn(N, Pu, x, Bn).astype(np.float32)),
          "alphas": jnp.asarray(0.01*rng.randn(N, Pu, Bn).astype(np.float32))}
    x0m = jnp.asarray(rng.randn(x, Bn).astype(np.float32))
    lamS = jnp.asarray(0.1*rng.rand(N, nS, Bn).astype(np.float32))
    mu = 10.0*jnp.ones((1, Bn), jnp.float32)
    gate = jnp.ones((N, P, Bn), jnp.float32)
    scal = jnp.broadcast_to(jnp.asarray(0.1*0.5**np.arange(C, dtype=np.float32))[:, None], (C, Bn))
    return op, st, x0m, lamS, mu, gate, scal

def emit(x0m_, op_, st_, scal_):
    return _run(dyn, None, spec, x0m_, op_, st_, scal_, None, None, None, None,
                compute_merit=False, emit_traj=True, batch_block=Bb, interpret=False)

op, st, x0m, lamS, mu, gate, scal = operands(128)

def y1(x0m_, op_, st_, scal_, lamS_, mu_, gate_):
    xc, uc = emit(x0m_, op_, st_, scal_)
    m = _xla_merits(pcs, spec, xc, uc, op_["t0"], lamS_, None, mu_, gate_)
    return m, xc, uc

f = jax.jit(y1)
cs, rs = timeit(f, x0m, op, st, scal, lamS, mu, gate)
rec(stage="y1_escape", compile_s=round(cs,1), per_call_ms=round(rs*1e3,3))

f_emit = jax.jit(emit)
f_merit = jax.jit(lambda xc, uc, t0, ls, m_, g: _xla_merits(
    pcs, spec, xc, uc, t0, ls, None, m_, g))

def chain(x0m_, op_, st_, scal_, lamS_, mu_, gate_):
    xc, uc = f_emit(x0m_, op_, st_, scal_)
    return f_merit(xc, uc, op_["t0"], lamS_, mu_, gate_)

cs, rs = timeit(chain, x0m, op, st, scal, lamS, mu, gate)
rec(stage="y2_chain", compile_s=round(cs,1), per_call_ms=round(rs*1e3,3))

opF, stF, x0mF, lamSF, muF, gateF, scalF = operands(1024)
cs, rs = timeit(chain, x0mF, opF, stF, scalF, lamSF, muF, gateF)
rec(stage="y3_chain_full", compile_s=round(cs,1), per_call_ms=round(rs*1e3,3))
rec(stage="done")
