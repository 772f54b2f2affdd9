import sys, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas.sweep import _run

OUT = "/root/repo/tools/layout_inspect.txt"
def rec(s):
    print(s, flush=True)
    with open(OUT, "a") as f: f.write(s + "\n")

Bb, C = 128, 8
problem = make_problem()
dyn, spec = problem.dynamics, problem.spec
N, x, P, u = spec.num_time_steps, spec.xdim, spec.num_players, spec.umax
Pu = P * u
rng = np.random.RandomState(0)
op = {"xs": jnp.asarray(rng.randn(N, x, Bb).astype(np.float32)),
      "us": jnp.asarray(0.01*rng.randn(N, Pu, Bb).astype(np.float32)),
      "t0": jnp.zeros((1, Bb), jnp.float32)}
st = {"Ps": jnp.asarray(0.01*rng.randn(N, Pu, x, Bb).astype(np.float32)),
      "alphas": jnp.asarray(0.01*rng.randn(N, Pu, Bb).astype(np.float32))}
x0m = jnp.asarray(rng.randn(x, Bb).astype(np.float32))
scal = jnp.broadcast_to(jnp.asarray(0.1*0.5**np.arange(C, dtype=np.float32))[:, None], (C, Bb))

f_emit = jax.jit(lambda x0m_, op_, st_, scal_: _run(
    dyn, None, spec, x0m_, op_, st_, scal_, None, None, None, None,
    compute_merit=False, emit_traj=True, batch_block=Bb, interpret=False))
xc, uc = jax.block_until_ready(f_emit(x0m, op, st, scal))
for name in ("format", "layout"):
    try:
        rec(f"pallas out {name}: {getattr(xc, name)}")
    except Exception as e:
        rec(f"pallas out {name} err: {e}")
ar = jnp.asarray(rng.randn(N, x, C, Bb).astype(np.float32))
try: rec(f"np-created: {ar.format}")
except Exception as e: rec(f"np fmt err {e}")
fa = jax.jit(lambda a: a * 1.0000001)
out = jax.block_until_ready(fa(ar))
try: rec(f"xla-produced: {out.format}")
except Exception as e: rec(f"xla fmt err {e}")
f_sum = jax.jit(lambda a: a.sum())
c = f_sum.lower(ar).compile()
for attr in ("input_formats", "input_layouts"):
    try: rec(f"f_sum {attr}: {getattr(c, attr)}")
    except Exception as e: rec(f"f_sum {attr} err: {e}")
c2 = f_sum.lower(xc).compile()
for attr in ("input_formats", "input_layouts"):
    try: rec(f"f_sum(on pallas-out aval) {attr}: {getattr(c2, attr)}")
    except Exception as e: rec(f"{attr} err: {e}")
rec("done")
