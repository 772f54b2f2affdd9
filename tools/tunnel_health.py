"""Probe pallas-dispatch health: ~0.05 ms/call = healthy, ~10 ms = degraded."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from ilqgames_tpu.examples.three_player_intersection import make_problem
from ilqgames_tpu.ops.pallas.sweep import _run

Bb, C = 128, 8
problem = make_problem()
dyn, spec = problem.dynamics, problem.spec
N, x, Pu = spec.num_time_steps, spec.xdim, spec.num_players * spec.umax
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
out = f_emit(x0m, op, st, scal); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(20): out = f_emit(x0m, op, st, scal)
jax.block_until_ready(out)
ms = (time.perf_counter()-t0)/20*1e3
f_x = jax.jit(lambda a: a * 1.0000001)
ar = jnp.ones((1024, 1024), jnp.float32)
out = f_x(ar); jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(50): out = f_x(out)
jax.block_until_ready(out)
xms = (time.perf_counter()-t0)/50*1e3
print(json.dumps(dict(pallas_emit_ms=round(ms,3), xla_ms=round(xms,3),
                      healthy=ms < 2.0)))
