import sys, os, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from ilqgames_tpu.costs import player_cost as pcost
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas.sweep import _run, _xla_merits

OUT = "/root/repo/tools/scoped_vmem_probe.txt"
def rec(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f: f.write(line + "\n")

Bb, C = 128, 8
problem = make_problem()
dyn, spec, pcs = problem.dynamics, problem.spec, problem.player_costs
N, x, P, u = spec.num_time_steps, spec.xdim, spec.num_players, spec.umax
Pu = P * u
rng = np.random.RandomState(0)
n_sc = [len(pc.state_constraints) for pc in pcs]
nS = sum(n_sc)
op = {"xs": jnp.asarray(rng.randn(N, x, Bb).astype(np.float32)),
      "us": jnp.asarray(0.01*rng.randn(N, Pu, Bb).astype(np.float32)),
      "t0": jnp.zeros((1, Bb), jnp.float32)}
st = {"Ps": jnp.asarray(0.01*rng.randn(N, Pu, x, Bb).astype(np.float32)),
      "alphas": jnp.asarray(0.01*rng.randn(N, Pu, Bb).astype(np.float32))}
x0m = jnp.asarray(rng.randn(x, Bb).astype(np.float32))
lamS = jnp.asarray(0.1*rng.rand(N, nS, Bb).astype(np.float32))
mu = 10.0*jnp.ones((1, Bb), jnp.float32)
gate = jnp.ones((N, P, Bb), jnp.float32)
scal = jnp.broadcast_to(jnp.asarray(0.1*0.5**np.arange(C, dtype=np.float32))[:, None], (C, Bb))

def composed(x0m_, op_, st_, scal_, lamS_, mu_, gate_):
    xc, uc = _run(dyn, None, spec, x0m_, op_, st_, scal_, None, None, None, None,
                  compute_merit=False, emit_traj=True, batch_block=Bb, interpret=False)
    return _xla_merits(pcs, spec, xc, uc, op_["t0"], lamS_, None, mu_, gate_)

args = (x0m, op, st, scal, lamS, mu, gate)
kib = int(os.environ.get("PROBE_KIB", "4096"))
try:
    t0 = time.perf_counter()
    c = jax.jit(composed).lower(*args).compile(
        compiler_options={"xla_tpu_scoped_vmem_limit_kib": str(kib)})
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = c(*args); jax.block_until_ready(out)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(20): out = c(*args)
    jax.block_until_ready(out)
    rec(kib=kib, compile_s=round(compile_s,1), first_s=round(first,2),
        per_call_ms=round((time.perf_counter()-t0)/20*1e3,3))
except Exception as e:
    rec(kib=kib, error=str(e)[:300])
